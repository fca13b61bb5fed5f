"""Fused pass-1 stats kernel == the materialised logits chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hybridgl_tpu.kernels.masks import box_from_profiles, mask_to_box, stability_score
from hybridgl_tpu.kernels.pass1_stats import pass1_stats
from hybridgl_tpu.kernels.resize import _composed_axis_weights, place_two_stage


@pytest.mark.parametrize(
    "C,mid,window",
    [
        (64, 128, (0.0, 0.0, 48, 40)),
        (64, 128, (7.0, 3.0, 30, 55)),
        (96, 64, (0.0, 0.0, 96, 96)),
    ],
)
def test_pass1_stats_matches_materialised_chain(rng, C, mid, window):
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
