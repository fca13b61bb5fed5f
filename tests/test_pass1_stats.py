"""Fused pass-1 stats kernel == the materialised logits chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hybridgl_tpu.kernels.masks import box_from_profiles, mask_to_box, stability_score
from hybridgl_tpu.kernels.pass1_stats import pass1_stats
from hybridgl_tpu.kernels.resize import _composed_axis_weights, place_two_stage


@pytest.fixture
def f32_stats(monkeypatch):
    """Pin the stats chain to f32 (HYBRIDGL_STATS_BF16=0): the exact-
    equality goldens compare against an f32 materialised chain; the
    default bf16 serving path is covered by test_bf16_stats_close."""
    monkeypatch.setenv("HYBRIDGL_STATS_BF16", "0")


@pytest.mark.parametrize(
    "C,mid,window",
    [
        (64, 128, (0.0, 0.0, 48, 40)),
        (64, 128, (7.0, 3.0, 30, 55)),
        (96, 64, (0.0, 0.0, 96, 96)),
    ],
)
def test_pass1_stats_matches_materialised_chain(rng, f32_stats, C, mid, window):
    n, B = 16, 5
    thresh, offset = 0.0, 1.0
    y0, x0, dh, dw = window
    rh, rw = int(mid * 0.9), int(mid * 0.7)
    low = rng.standard_normal((B, n, n), dtype=np.float32) * 2.0

    logits = place_two_stage(
        jnp.asarray(low), mid, (rh, rw), (C, C), (y0, x0), (dh, dw), fill=-1e4
    )
    ref_stab = stability_score(logits, thresh, offset)
    ref_masks = logits > thresh
    ref_boxes = mask_to_box(ref_masks)
    ref_nonempty = ref_masks.any(axis=(-2, -1))

    Wy = _composed_axis_weights(C, n, mid, rh, y0, dh)
    Wx = _composed_axis_weights(C, n, mid, rw, x0, dw)
    stab, row_any, col_any = pass1_stats(
        jnp.asarray(low), Wx.T, Wy, (y0, x0, dh, dw), thresh, offset
    )
    boxes = box_from_profiles(row_any, col_any)

    # hi/lo counts are integers; the only tolerance needed is for pixels
    # whose logit lands exactly on a threshold boundary (none with
    # continuous random data)
    np.testing.assert_allclose(np.asarray(stab), np.asarray(ref_stab), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(boxes), np.asarray(ref_boxes))
    np.testing.assert_array_equal(
        np.asarray(row_any.any(axis=-1)), np.asarray(ref_nonempty)
    )


def test_pass1_stats_zero_lo_is_filtered_like_nan(rng):
    """A candidate empty even at thresh-offset: the chain yields 0/0 = nan
    (always fails a positive stability threshold AND the nonempty test);
    the kernel yields 0.0 — equivalent because nonempty also fails."""
    n, B, C, mid = 16, 2, 64, 128
    low = np.full((B, n, n), -100.0, np.float32)
    Wy = _composed_axis_weights(C, n, mid, mid, 0, 50)
    Wx = _composed_axis_weights(C, n, mid, mid, 0, 50)
    stab, row_any, _ = pass1_stats(
        jnp.asarray(low), Wx.T, Wy, (0, 0, 50, 50), 0.0, 1.0
    )
    assert not bool(row_any.any())
    assert np.all(np.asarray(stab) == 0.0)


def test_blocked_half_transform_path_matches_interleaved(rng, f32_stats):
    """pass1_stats_half over half_transform_blocked(y) == interleaving y
    first and running the classic kernel (the AMG pass-1 production path:
    the decoder's blocked upscale output is consumed without the strided
    relayout copy)."""
    from hybridgl_tpu.kernels.pass1_stats import (
        half_transform_blocked,
        pass1_stats_half,
    )
    from hybridgl_tpu.kernels.upscale_hyper import interleave_blocked_masks

    g, M, B, C, mid = 16, 3, 4, 96, 64
    n = 4 * g
    y = jnp.asarray(rng.standard_normal((B, g * g, 16 * M)).astype(np.float32))
    window = (3.0, 5.0, 50, 40)
    Wy = _composed_axis_weights(C, n, mid, int(mid * 0.9), 3, 50)
    Wx = _composed_axis_weights(C, n, mid, int(mid * 0.7), 5, 40)

    low = interleave_blocked_masks(y, g, M).reshape(B * M, n, n)
    s0, r0, c0 = pass1_stats(low, Wx.T, Wy, window, 0.0, 1.0)

    half = half_transform_blocked(y, Wx.T, g, M)
    s1, r1, c1 = pass1_stats_half(half, Wy, window, 0.0, 1.0)

    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))


def test_bf16_stats_close(rng, monkeypatch):
    """The default bf16 stats chain (HYBRIDGL_STATS_BF16, see
    pass1_stats.use_bf16_stats) tracks the f32 chain: stability within
    ~1e-2 (counts ratios of thresholded bf16-grade logits), box edges
    within 2 px, and profile flips confined to threshold-crossing pixels
    (small fraction)."""
    from hybridgl_tpu.kernels.pass1_stats import (
        half_transform_blocked,
        pass1_stats_half,
    )

    g, M, B, C, mid = 16, 3, 8, 96, 64
    n = 4 * g
    y = jnp.asarray(rng.standard_normal((B, g * g, 16 * M)).astype(np.float32))
    window = (3.0, 5.0, 50, 40)
    Wy = _composed_axis_weights(C, n, mid, int(mid * 0.9), 3, 50)
    Wx = _composed_axis_weights(C, n, mid, int(mid * 0.7), 5, 40)

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("HYBRIDGL_STATS_BF16", flag)
        half = half_transform_blocked(y, Wx.T, g, M)
        outs[flag] = jax.tree_util.tree_map(
            np.asarray, pass1_stats_half(half, Wy, window, 0.0, 1.0)
        )
    s1, r1, c1 = outs["1"]
    s0, r0, c0 = outs["0"]
    assert np.abs(s1 - s0).max() < 2e-2, np.abs(s1 - s0).max()
    # profiles: flips only near threshold crossings — bounded fraction
    assert (r1 != r0).mean() < 0.03
    assert (c1 != c0).mean() < 0.03


def test_predict_masks_return_blocked_interleaves_to_masks(rng):
    """predict_masks(return_blocked=True) carries exactly the standard
    output, modulo the deferred spatial interleave (the AMG pass-1
    production path relies on this layout contract) — fused kernels on
    and off."""
    import os
    import sys

    import pytest

    from hybridgl_tpu.core.params import init_sam
    from hybridgl_tpu.kernels.upscale_hyper import interleave_blocked_masks
    from hybridgl_tpu.models.sam.decoder import predict_masks

    sys.path.insert(0, os.path.dirname(__file__))
    from torch_ref_sam import tiny_sam_config

    cfg = tiny_sam_config()
    p_dec = init_sam(jax.random.PRNGKey(3), cfg)["decoder"]
    B = 4
    g, C = cfg.embed_grid, cfg.prompt_dim
    emb = jnp.asarray(rng.standard_normal((g, g, C), dtype=np.float32) * 0.5)
    pe = jnp.asarray(rng.standard_normal((g, g, C), dtype=np.float32) * 0.5)
    sparse = jnp.asarray(rng.standard_normal((B, 3, C), dtype=np.float32) * 0.5)

    for fused in ("1", "0"):
        os.environ["HYBRIDGL_FUSED_UPSCALE"] = fused
        try:
            masks, iou = predict_masks(
                p_dec, emb, pe, sparse, cfg, multimask_output=True
            )
            y, iou_b = predict_masks(
                p_dec, emb, pe, sparse, cfg, multimask_output=True,
                return_blocked=True,
            )
        finally:
            del os.environ["HYBRIDGL_FUSED_UPSCALE"]
        M = masks.shape[1]
        np.testing.assert_allclose(
            np.asarray(interleave_blocked_masks(y, g, M)),
            np.asarray(masks),
            atol=1e-5,
            err_msg=f"fused={fused}",
        )
        np.testing.assert_allclose(
            np.asarray(iou_b), np.asarray(iou), atol=1e-6, err_msg=f"fused={fused}"
        )
