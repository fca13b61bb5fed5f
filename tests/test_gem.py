import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hybridgl_tpu.core.config import GemConfig
from hybridgl_tpu.core.convert import convert_clip
from hybridgl_tpu.models.gem.gem import (
    gem_heatmap,
    gem_image_features,
    gem_preprocess,
    interpolate_pos_embedding,
    self_self_attention,
)

from torch_ref import make_tiny_clip


@pytest.fixture(scope="module")
def clip_setup():
    model, cfg = make_tiny_clip()
    params = convert_clip(model.openai_state_dict(), cfg)
    return cfg, params


def test_interpolate_pos_embedding():
    g = 4
    pos = np.arange((g * g + 1) * 3, dtype=np.float32).reshape(g * g + 1, 3)
    up = np.asarray(interpolate_pos_embedding(jnp.asarray(pos), 8))
    assert up.shape == (65, 3)
    np.testing.assert_array_equal(up[0], pos[0])  # CLS untouched


def test_self_self_attention_shapes_and_rows(rng):
    q = jnp.asarray(rng.standard_normal((2, 3, 10, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 3, 10, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 3, 10, 8)), jnp.float32)
    out = self_self_attention(q, k, v, temp=0.35, iters=1)
    assert out.shape == (2, 3, 10, 8)
    assert np.isfinite(np.asarray(out)).all()
    # with identical tokens, attention is uniform -> output == mean of v rows
    vv = jnp.broadcast_to(v[:, :, :1, :], v.shape)
    qq = jnp.broadcast_to(q[:, :, :1, :], q.shape)
    out2 = np.asarray(self_self_attention(qq, qq, vv, temp=0.35, iters=1))
    np.testing.assert_allclose(out2, np.asarray(vv), atol=1e-5)


def test_gem_image_features_and_heatmap(clip_setup, rng):
    cfg, params = clip_setup
    gem_cfg = GemConfig(img_size=cfg.image_size * 2, depth=2, ss_attn_iters=1)
    img = rng.standard_normal(
        (1, gem_cfg.img_size, gem_cfg.img_size, 3)
    ).astype(np.float32)
    pf, cls, G = gem_image_features(params["visual"], jnp.asarray(img), cfg, gem_cfg)
    assert G == gem_cfg.img_size // cfg.patch_size
    assert pf.shape == (1, G * G, cfg.embed_dim)
    assert cls.shape == (1, cfg.embed_dim)

    text = rng.standard_normal((2, cfg.embed_dim)).astype(np.float32)
    heat = gem_heatmap(params, jnp.asarray(img[0]), jnp.asarray(text), cfg, gem_cfg)
    assert heat.shape == (2, gem_cfg.img_size, gem_cfg.img_size)
    assert np.isfinite(np.asarray(heat)).all()
    # cosine relevance is bounded
    assert np.abs(np.asarray(heat)).max() <= 1.0 + 1e-5


def test_gem_preprocess(rng):
    img = rng.integers(0, 255, (30, 40, 3)).astype(np.uint8)
    out = np.asarray(gem_preprocess(jnp.asarray(img), 32))
    assert out.shape == (32, 32, 3)
    # normalized: roughly zero-centered for mid-grey input
    grey = np.full((8, 8, 3), 124, np.uint8)
    g = np.asarray(gem_preprocess(jnp.asarray(grey), 8))
    assert np.abs(g.mean()) < 1.0


def test_gem_depth_zero_matches_plain_clip_disabled():
    # depth covering no blocks -> gem stream never initialised would break;
    # depth must be >= 1 by contract
    cfg = GemConfig(depth=1)
    assert cfg.depth >= 1


def test_gem_matches_torch_restatement(clip_setup, rng):
    """Cross-check vs an INDEPENDENT torch restatement of the paper
    (tests/torch_ref_gem.py): validates qkv layout, the self-self ensemble,
    stream bookkeeping and pos-embed interpolation."""
    import torch
    from torch_ref import make_tiny_clip
    from torch_ref_gem import torch_gem_features

    cfg, params = clip_setup
    model, _ = make_tiny_clip()
    for depth, iters in ((2, 1), (3, 2)):
        gem_cfg = GemConfig(img_size=cfg.image_size * 2, depth=depth, ss_attn_iters=iters)
        img = rng.standard_normal(
            (2, gem_cfg.img_size, gem_cfg.img_size, 3)
        ).astype(np.float32)
        pf, cls, G = gem_image_features(
            params["visual"], jnp.asarray(img), cfg, gem_cfg
        )
        t_pf, t_cls = torch_gem_features(
            model, torch.from_numpy(img).permute(0, 3, 1, 2), depth, iters
        )
        np.testing.assert_allclose(
            np.asarray(pf), t_pf.numpy(), atol=2e-4, rtol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(cls), t_cls.numpy(), atol=2e-4, rtol=2e-4
        )
