"""Stacked/scanned transformer paths == the unrolled list paths.

The serving pipeline pre-stacks block params (clip/layers.py:
stack_block_params, sam/image_encoder.py:stack_encoder_runs) and runs
lax.scan over them; these tests pin numerical identity against the
original per-block loops for every consumer (CLIP fusion modes, text
encoder, GEM) on tiny configs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hybridgl_tpu.core.params import init_clip
from hybridgl_tpu.models.clip.fusion import hybrid_forward
from hybridgl_tpu.models.clip.layers import stack_block_params
from hybridgl_tpu.models.clip.text import encode_text
from hybridgl_tpu.models.gem.gem import gem_image_features
from hybridgl_tpu.core.config import GemConfig

import sys, os

sys.path.insert(0, os.path.dirname(__file__))
from torch_ref import tiny_clip_config  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_clip_config()
    params = init_clip(jax.random.PRNGKey(3), cfg)
    stacked = dict(params)
    vis = dict(stacked["visual"])
    vis["blocks_stacked"] = stack_block_params(vis["blocks"])
    txt = dict(stacked["text"])
    txt["blocks_stacked"] = stack_block_params(txt["blocks"])
    stacked["visual"], stacked["text"] = vis, txt
    return cfg, params, stacked


MODES = ["crop", "token_masking", "attn_masking", "L2G", "G2L", "G2L&L2G"]


@pytest.mark.parametrize("mode", MODES)
def test_fusion_modes_stacked_equals_list(tiny, rng, mode):
    cfg, params, stacked = tiny
    P, S = 3, cfg.image_size
    local = jnp.asarray(rng.standard_normal((P, S, S, 3)), jnp.float32)
    glob = jnp.asarray(rng.standard_normal((P, S, S, 3)), jnp.float32)
    masks = jnp.asarray(rng.random((P, 24, 24)) > 0.5)
    kw = dict(cfg=cfg, fusion_mode=mode, masking_block=cfg.vision_layers - 2)
    a = hybrid_forward(params["visual"], local, glob, masks, **kw)
    b = hybrid_forward(stacked["visual"], local, glob, masks, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5)


def test_text_stacked_equals_list(tiny, rng):
    cfg, params, stacked = tiny
    toks = jnp.asarray(rng.integers(1, cfg.vocab_size - 2, (4, cfg.context_length)), jnp.int32)
    toks = toks.at[:, -1].set(cfg.vocab_size - 1)  # EOT = max id
    a = encode_text(params["text"], toks, cfg)
    b = encode_text(stacked["text"], toks, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5)


def test_text_masking_index_works_on_stacked_only_params(tiny, rng):
    """The pipeline's serving pytree drops the per-block list; the
    masking_index branch must reconstruct blocks from the stacked pytree
    (regression: KeyError 'blocks')."""
    cfg, params, stacked = tiny
    txt_stacked_only = {k: v for k, v in stacked["text"].items() if k != "blocks"}
    toks = jnp.asarray(rng.integers(1, cfg.vocab_size - 2, (2, cfg.context_length)), jnp.int32)
    toks = toks.at[:, -1].set(cfg.vocab_size - 1)
    a = encode_text(params["text"], toks, cfg, masking_index=[1], masking_block=1)
    b = encode_text(txt_stacked_only, toks, cfg, masking_index=[1], masking_block=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5)


def test_gem_stacked_equals_list(tiny, rng):
    cfg, params, stacked = tiny
    gem_cfg = GemConfig(img_size=cfg.image_size * 2, depth=2, ss_attn_iters=1)
    img = jnp.asarray(rng.standard_normal((1, gem_cfg.img_size, gem_cfg.img_size, 3)), jnp.float32)
    a = gem_image_features(params["visual"], img, cfg, gem_cfg)
    b = gem_image_features(stacked["visual"], img, cfg, gem_cfg)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=2e-5, rtol=2e-5)
