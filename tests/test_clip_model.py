import numpy as np
import torch
import pytest

import jax.numpy as jnp

from hybridgl_tpu.core.convert import convert_clip
from hybridgl_tpu.models.clip.vit import encode_image, vit_stem, vit_blocks, vit_head
from hybridgl_tpu.models.clip.text import encode_text

from torch_ref import make_tiny_clip


@pytest.fixture(scope="module")
def clip_pair():
    model, cfg = make_tiny_clip()
    params = convert_clip(model.openai_state_dict(), cfg)
    return model, cfg, params


def test_encode_image_matches_torch(clip_pair, rng):
    model, cfg, params = clip_pair
    imgs = rng.standard_normal((5, cfg.image_size, cfg.image_size, 3), dtype=np.float32)
    ours = np.asarray(encode_image(params["visual"], jnp.asarray(imgs), cfg))
    with torch.no_grad():
        ref = model.encode_image(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_encode_image_all_tokens(clip_pair, rng):
    model, cfg, params = clip_pair
    imgs = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3), dtype=np.float32)
    x = vit_stem(params["visual"], jnp.asarray(imgs), cfg)
    x = vit_blocks(params["visual"], x, cfg)
    ours = np.asarray(vit_head(params["visual"], x, cfg, cls_only=False))
    with torch.no_grad():
        ref = model.encode_image(
            torch.from_numpy(imgs).permute(0, 3, 1, 2), cls_only=False
        ).numpy()
    assert ours.shape == (2, cfg.seq_len, cfg.embed_dim)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_encode_text_matches_torch(clip_pair, rng):
    model, cfg, params = clip_pair
    # synthetic tokens: sot .. random .. eot(max id) padding 0
    N = 4
    toks = np.zeros((N, cfg.context_length), np.int64)
    for i in range(N):
        n = int(rng.integers(3, cfg.context_length - 2))
        toks[i, 0] = cfg.vocab_size - 2
        toks[i, 1:n] = rng.integers(1, cfg.vocab_size - 2, n - 1)
        toks[i, n] = cfg.vocab_size - 1  # eot = highest id
    ours = np.asarray(encode_text(params["text"], jnp.asarray(toks, jnp.int32), cfg))
    with torch.no_grad():
        ref = model.encode_text(torch.from_numpy(toks)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_noun_index_pooling(clip_pair):
    _, cfg, params = clip_pair
    toks = np.zeros((1, cfg.context_length), np.int64)
    toks[0, 0] = cfg.vocab_size - 2
    toks[0, 1:5] = [5, 6, 7, 8]
    toks[0, 5] = cfg.vocab_size - 1
    a = np.asarray(
        encode_text(params["text"], jnp.asarray(toks, jnp.int32), cfg, target_noun_index=np.array([2]))
    )
    b = np.asarray(encode_text(params["text"], jnp.asarray(toks, jnp.int32), cfg))
    # pooling at a different token must give different features
    assert not np.allclose(a, b)


def test_text_masking_feature(clip_pair):
    """Token-masked text encoding (reference backbone.py:34-56: zero the
    masked token rows from masking_block on)."""
    model, cfg, params = clip_pair
    toks = np.zeros((1, cfg.context_length), np.int64)
    toks[0, 0] = cfg.vocab_size - 2
    toks[0, 1:6] = [5, 6, 7, 8, 9]
    toks[0, 6] = cfg.vocab_size - 1
    t = jnp.asarray(toks, jnp.int32)
    base = np.asarray(encode_text(params["text"], t, cfg))
    masked = np.asarray(
        encode_text(
            params["text"], t, cfg, masking_index=[2, 3], masking_block=0
        )
    )
    assert not np.allclose(base, masked)
    # masking after the last block is a no-op
    untouched = np.asarray(
        encode_text(
            params["text"], t, cfg, masking_index=[2, 3],
            masking_block=cfg.text_layers + 1,
        )
    )
    np.testing.assert_allclose(base, untouched, atol=1e-6)
