"""prepare_decoder_params == the raw decode path.

The serving param stack (models/sam/image_encoder.py:stack_encoder_runs)
hoists every weight-only product of the mask decoder out of the AMG decode
scan (models/sam/decoder.py:prepare_decoder_params). All of them are exact
matmul reassociations, so predict_masks over prepared params must match the
raw-param path to float tolerance — with the fused kernels on (the serving
configuration; interpret mode on CPU) and off (pure XLA).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hybridgl_tpu.core.params import init_sam
from hybridgl_tpu.models.sam import decoder as dec
from hybridgl_tpu.models.sam.decoder import predict_masks, prepare_decoder_params
from hybridgl_tpu.models.sam.image_encoder import stack_encoder_runs

sys.path.insert(0, os.path.dirname(__file__))
from torch_ref_sam import tiny_sam_config


def _setup(rng):
    cfg = tiny_sam_config()
    p_dec = init_sam(jax.random.PRNGKey(3), cfg)["decoder"]
    B = 5
    g, C = cfg.embed_grid, cfg.prompt_dim
    emb = jnp.asarray(rng.standard_normal((g, g, C), dtype=np.float32) * 0.5)
    pe = jnp.asarray(rng.standard_normal((g, g, C), dtype=np.float32) * 0.5)
    sparse = jnp.asarray(rng.standard_normal((B, 3, C), dtype=np.float32) * 0.5)
    dense = jnp.asarray(rng.standard_normal((g, g, C), dtype=np.float32) * 0.1)
    return cfg, p_dec, emb, pe, sparse, dense


@pytest.mark.parametrize("fused", ["1", "0"])
def test_prepared_matches_raw(rng, monkeypatch, fused):
    monkeypatch.setenv("HYBRIDGL_FUSED_UPSCALE", fused)
    monkeypatch.setenv("HYBRIDGL_FUSED_I2T", fused)
    monkeypatch.setenv("HYBRIDGL_FUSED_T2I", fused)
    cfg, p_dec, emb, pe, sparse, dense = _setup(rng)
    ref_m, ref_iou = predict_masks(p_dec, emb, pe, sparse, cfg, dense_prompts=dense)
    prep = prepare_decoder_params(p_dec, cfg)
    out_m, out_iou = predict_masks(prep, emb, pe, sparse, cfg, dense_prompts=dense)
    np.testing.assert_allclose(np.asarray(out_iou), np.asarray(ref_iou), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref_m), atol=3e-4)


def test_prepared_matches_raw_batched_dense(rng, monkeypatch):
    # batched dense prompts exercise the NON-shared two-way path (layer 0
    # runs the generic fused sites)
    monkeypatch.setenv("HYBRIDGL_FUSED_UPSCALE", "1")
    monkeypatch.setenv("HYBRIDGL_FUSED_I2T", "1")
    monkeypatch.setenv("HYBRIDGL_FUSED_T2I", "1")
    cfg, p_dec, emb, pe, sparse, dense = _setup(rng)
    g, C = cfg.embed_grid, cfg.prompt_dim
    dense_b = jnp.broadcast_to(dense[None], (sparse.shape[0], g, g, C)) * 1.0
    ref_m, ref_iou = predict_masks(p_dec, emb, pe, sparse, cfg, dense_prompts=dense_b)
    prep = prepare_decoder_params(p_dec, cfg)
    out_m, out_iou = predict_masks(prep, emb, pe, sparse, cfg, dense_prompts=dense_b)
    np.testing.assert_allclose(np.asarray(out_iou), np.asarray(ref_iou), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref_m), atol=3e-4)


def test_prepared_matches_raw_bf16(rng, monkeypatch):
    # the serving configuration: bf16-cast params, fused kernels on. The
    # folded products are additionally rounded to bf16, so tolerances are
    # bf16-scale — this pins the branch the f32 tests never reach.
    monkeypatch.setenv("HYBRIDGL_FUSED_UPSCALE", "1")
    monkeypatch.setenv("HYBRIDGL_FUSED_I2T", "1")
    monkeypatch.setenv("HYBRIDGL_FUSED_T2I", "1")
    from hybridgl_tpu.core.params import cast_pytree

    cfg, p_dec, emb, pe, sparse, dense = _setup(rng)
    p16 = cast_pytree(p_dec, jnp.bfloat16)
    ref_m, ref_iou = predict_masks(p16, emb, pe, sparse, cfg, dense_prompts=dense)
    prep = prepare_decoder_params(p16, cfg)
    out_m, out_iou = predict_masks(prep, emb, pe, sparse, cfg, dense_prompts=dense)
    # logits come out f32 but carry bf16 noise through ~8 matmul layers
    scale = float(np.abs(np.asarray(ref_m)).max())
    np.testing.assert_allclose(
        np.asarray(out_m) / scale, np.asarray(ref_m) / scale, atol=0.05
    )
    np.testing.assert_allclose(np.asarray(out_iou), np.asarray(ref_iou), atol=0.05)


def test_stack_encoder_runs_prepares_decoder(rng):
    cfg = tiny_sam_config()
    p = init_sam(jax.random.PRNGKey(0), cfg)
    stacked = stack_encoder_runs(p, cfg)
    assert "prepared_final_t2i" in stacked["decoder"]["transformer"]
    assert "prepared" in stacked["decoder"]["upscale"]
    for layer in stacked["decoder"]["transformer"]["layers"]:
        assert "prepared_t2i" in layer and "prepared_i2t" in layer
    # raw weights are retained (non-fused fallbacks keep working)
    assert "cross_t2i" in stacked["decoder"]["transformer"]["layers"][0]


@pytest.mark.parametrize("prepared", [False, True])
def test_fused_pass_matches_unfused(rng, monkeypatch, prepared):
    """The fused layer pass (kernels/decoder_pass.py: i2t+LN + next-t2i in
    one sweep) must reproduce the separate-kernel shared-image path
    exactly, with raw AND prepared params."""
    cfg, p_dec, emb, pe, sparse, dense = _setup(rng)
    if prepared:
        p_dec = prepare_decoder_params(p_dec, cfg)
    monkeypatch.setenv("HYBRIDGL_FUSED_PASS", "0")
    ref_m, ref_iou = predict_masks(p_dec, emb, pe, sparse, cfg, dense_prompts=dense)
    monkeypatch.setenv("HYBRIDGL_FUSED_PASS", "1")
    out_m, out_iou = predict_masks(p_dec, emb, pe, sparse, cfg, dense_prompts=dense)
    np.testing.assert_allclose(
        np.asarray(out_m), np.asarray(ref_m), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_iou), np.asarray(ref_iou), atol=2e-4, rtol=2e-4
    )
