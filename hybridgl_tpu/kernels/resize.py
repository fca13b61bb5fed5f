"""Bilinear sampling / resize primitives (jit-friendly, static output shapes).

The reference leans on torch ``F.interpolate(mode='bilinear',
align_corners=False)`` and torchvision ``T.Resize(antialias=None)``
(reference: third_party/segment-anything/segment_anything/modeling/sam.py:154-161,
Hybridgl_main.py:116,121,201). Both use half-pixel source coordinates
without antialiasing; we implement exactly that convention with gathers so
that the *source extent may be a traced scalar*: the TPU pipeline keeps
every image in a fixed padded frame and resizes only its valid (h, w)
region, which lets one compiled program serve every image size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _src_coords(out_size: int, src_size, dtype=jnp.float32):
    """Half-pixel source coords for align_corners=False; src_size may be traced."""
    i = jnp.arange(out_size, dtype=dtype)
    scale = jnp.asarray(src_size, dtype) / out_size
    c = (i + 0.5) * scale - 0.5
    return jnp.clip(c, 0.0, jnp.asarray(src_size, dtype) - 1.0)


def _gather_axis(img, idx, axis):
    return jnp.take(img, idx, axis=axis)


def resize_bilinear(
    img: jax.Array,
    out_hw: tuple[int, int],
    src_hw=None,
) -> jax.Array:
    """Bilinear resize of the leading two axes of ``img`` ([H, W, ...]).

    Args:
      img: [H, W, *rest] array; H/W are the *padded frame* sizes (static).
      out_hw: static output (OH, OW).
      src_hw: optional (h, w) valid-region extent; ints or traced scalars.
        When given, only img[:h, :w] is (logically) sampled. Defaults to the
        full frame.

    Matches torch ``F.interpolate(..., mode='bilinear',
    align_corners=False)`` / torchvision ``Resize(antialias=None)`` on
    upsampling and non-antialiased downsampling.
    """
    H, W = img.shape[0], img.shape[1]
    oh, ow = out_hw
    if src_hw is None:
        src_h, src_w = H, W
    else:
        src_h, src_w = src_hw

    cy = _src_coords(oh, src_h)
    cx = _src_coords(ow, src_w)
    y0 = jnp.floor(cy).astype(jnp.int32)
    x0 = jnp.floor(cx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, jnp.asarray(src_h, jnp.int32) - 1)
    x1 = jnp.minimum(x0 + 1, jnp.asarray(src_w, jnp.int32) - 1)
    wy = (cy - y0).astype(img.dtype) if jnp.issubdtype(img.dtype, jnp.floating) else (cy - y0)
    wx = (cx - x0).astype(wy.dtype)

    compute = img
    if not jnp.issubdtype(img.dtype, jnp.floating):
        compute = img.astype(jnp.float32)

    top = _gather_axis(compute, y0, 0)
    bot = _gather_axis(compute, y1, 0)

    def lerp_rows(rows):
        l = _gather_axis(rows, x0, 1)
        r = _gather_axis(rows, x1, 1)
        wxb = wx.reshape((1, ow) + (1,) * (rows.ndim - 2))
        return l + (r - l) * wxb

    top = lerp_rows(top)
    bot = lerp_rows(bot)
    wyb = wy.reshape((oh, 1) + (1,) * (img.ndim - 2))
    out = top + (bot - top) * wyb
    return out


def resize_bilinear_batched(imgs, out_hw, src_hw=None):
    """vmapped resize over a leading batch axis ([N, H, W, ...])."""
    fn = lambda im: resize_bilinear(im, out_hw, src_hw)
    return jax.vmap(fn)(imgs)


def place_valid_region(
    img: jax.Array,
    src_hw,
    out_frame: tuple[int, int],
    dst_hw,
) -> jax.Array:
    """Resize img[:src_h, :src_w] to (dst_h, dst_w) placed at the origin of a
    zero-padded (OH, OW) frame; dst extents may be traced scalars.

    This is the canonical-frame transfer used throughout the pipeline: a
    mask/logit living in SAM's 1024 frame moves into the 640 eval frame with
    a per-image traced scale, under one static-shape compiled program.
    """
    OH, OW = out_frame
    dst_h = jnp.asarray(dst_hw[0], jnp.float32)
    dst_w = jnp.asarray(dst_hw[1], jnp.float32)
    src_h = jnp.asarray(src_hw[0], jnp.float32)
    src_w = jnp.asarray(src_hw[1], jnp.float32)

    i = jnp.arange(OH, dtype=jnp.float32)
    j = jnp.arange(OW, dtype=jnp.float32)
    cy = jnp.clip((i + 0.5) * (src_h / dst_h) - 0.5, 0.0, src_h - 1.0)
    cx = jnp.clip((j + 0.5) * (src_w / dst_w) - 0.5, 0.0, src_w - 1.0)

    y0 = jnp.floor(cy).astype(jnp.int32)
    x0 = jnp.floor(cx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, src_h.astype(jnp.int32) - 1)
    x1 = jnp.minimum(x0 + 1, src_w.astype(jnp.int32) - 1)
    wy = cy - y0
    wx = cx - x0

    compute = img if jnp.issubdtype(img.dtype, jnp.floating) else img.astype(jnp.float32)
    top = _gather_axis(compute, y0, 0)
    bot = _gather_axis(compute, y1, 0)

    def lerp_rows(rows):
        l = _gather_axis(rows, x0, 1)
        r = _gather_axis(rows, x1, 1)
        wxb = wx.reshape((1, OW) + (1,) * (rows.ndim - 2))
        return l + (r - l) * wxb

    top = lerp_rows(top)
    bot = lerp_rows(bot)
    wyb = wy.reshape((OH, 1) + (1,) * (img.ndim - 2))
    out = top + (bot - top) * wyb

    valid = (i.reshape(OH, 1) < dst_h) & (j.reshape(1, OW) < dst_w)
    valid = valid.reshape((OH, OW) + (1,) * (img.ndim - 2))
    return jnp.where(valid, out, 0.0)


def sample_region(
    img: jax.Array,
    src_origin,  # (y0, x0), traced ok
    src_hw,  # (sh, sw), traced ok
    out_hw: tuple[int, int],
) -> jax.Array:
    """Bilinear-resize img[y0:y0+sh, x0:x0+sw] to a static (OH, OW).

    The crop window may be fully dynamic — this is what lets the
    multi-crop AMG resize arbitrary crop boxes under one compiled program.
    """
    OH, OW = out_hw
    y0 = jnp.asarray(src_origin[0], jnp.float32)
    x0 = jnp.asarray(src_origin[1], jnp.float32)
    sh = jnp.asarray(src_hw[0], jnp.float32)
    sw = jnp.asarray(src_hw[1], jnp.float32)

    i = jnp.arange(OH, dtype=jnp.float32)
    j = jnp.arange(OW, dtype=jnp.float32)
    cy = y0 + jnp.clip((i + 0.5) * (sh / OH) - 0.5, 0.0, sh - 1.0)
    cx = x0 + jnp.clip((j + 0.5) * (sw / OW) - 0.5, 0.0, sw - 1.0)

    y0i = jnp.floor(cy).astype(jnp.int32)
    x0i = jnp.floor(cx).astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, (y0 + sh).astype(jnp.int32) - 1)
    x1i = jnp.minimum(x0i + 1, (x0 + sw).astype(jnp.int32) - 1)
    wy = cy - y0i
    wx = cx - x0i

    compute = img if jnp.issubdtype(img.dtype, jnp.floating) else img.astype(jnp.float32)
    top = _gather_axis(compute, y0i, 0)
    bot = _gather_axis(compute, y1i, 0)

    def lerp_rows(rows):
        l = _gather_axis(rows, x0i, 1)
        r = _gather_axis(rows, x1i, 1)
        wxb = wx.reshape((1, OW) + (1,) * (rows.ndim - 2))
        return l + (r - l) * wxb

    top = lerp_rows(top)
    bot = lerp_rows(bot)
    wyb = wy.reshape((OH, 1) + (1,) * (img.ndim - 2))
    return top + (bot - top) * wyb


def place_region(
    img: jax.Array,
    src_hw,
    out_frame: tuple[int, int],
    dst_origin,  # (y0, x0) traced
    dst_hw,  # (dh, dw) traced
    fill=0.0,
    src_origin=(0, 0),  # (sy0, sx0) traced: crop window origin in img
) -> jax.Array:
    """Resize img[sy0:sy0+sh, sx0:sx0+sw] to (dh, dw) placed at (y0, x0) of
    a fill-padded static frame. Covers both the 'uncrop' of multi-crop AMG
    (reference: utils/amg.py:255-264) and crop-cutting with resize."""
    OH, OW = out_frame
    y0 = jnp.asarray(dst_origin[0], jnp.float32)
    x0 = jnp.asarray(dst_origin[1], jnp.float32)
    dh = jnp.asarray(dst_hw[0], jnp.float32)
    dw = jnp.asarray(dst_hw[1], jnp.float32)
    sh = jnp.asarray(src_hw[0], jnp.float32)
    sw = jnp.asarray(src_hw[1], jnp.float32)
    sy0 = jnp.asarray(src_origin[0], jnp.float32)
    sx0 = jnp.asarray(src_origin[1], jnp.float32)

    i = jnp.arange(OH, dtype=jnp.float32)
    j = jnp.arange(OW, dtype=jnp.float32)
    # output pixel (i, j) samples source at ((i - y0 + .5) * sh/dh - .5, ...)
    cy = sy0 + jnp.clip((i - y0 + 0.5) * (sh / dh) - 0.5, 0.0, sh - 1.0)
    cx = sx0 + jnp.clip((j - x0 + 0.5) * (sw / dw) - 0.5, 0.0, sw - 1.0)

    y0i = jnp.floor(cy).astype(jnp.int32)
    x0i = jnp.floor(cx).astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, (sy0 + sh).astype(jnp.int32) - 1)
    x1i = jnp.minimum(x0i + 1, (sx0 + sw).astype(jnp.int32) - 1)
    wy = cy - y0i
    wx = cx - x0i

    compute = img if jnp.issubdtype(img.dtype, jnp.floating) else img.astype(jnp.float32)
    top = _gather_axis(compute, y0i, 0)
    bot = _gather_axis(compute, y1i, 0)

    def lerp_rows(rows):
        l = _gather_axis(rows, x0i, 1)
        r = _gather_axis(rows, x1i, 1)
        wxb = wx.reshape((1, OW) + (1,) * (rows.ndim - 2))
        return l + (r - l) * wxb

    top = lerp_rows(top)
    bot = lerp_rows(bot)
    wyb = wy.reshape((OH, 1) + (1,) * (img.ndim - 2))
    out = top + (bot - top) * wyb

    inside = (
        (i.reshape(OH, 1) >= y0)
        & (i.reshape(OH, 1) < y0 + dh)
        & (j.reshape(1, OW) >= x0)
        & (j.reshape(1, OW) < x0 + dw)
    )
    inside = inside.reshape((OH, OW) + (1,) * (img.ndim - 2))
    return jnp.where(inside, out, fill)


def _resample_weights(
    out_frame: int,
    in_frame: int,
    in_extent,
    out_extent,
    antialias: bool,
    dtype=jnp.float32,
):
    """Dense [out_frame, in_frame] 1-D resampling matrix.

    Maps the first ``in_extent`` source samples onto the first
    ``out_extent`` output rows (both may be traced scalars); rows past
    ``out_extent`` and columns past ``in_extent`` are zero. With
    ``antialias`` this is the triangle filter torch uses for
    ``F.interpolate(mode='bilinear', antialias=True)`` / torchvision
    ``T.Resize(antialias=True)``: on downsampling the filter support is
    widened by the scale factor (a proper low-pass), on upsampling it
    reduces to plain half-pixel bilinear. Boundary taps are dropped and the
    row renormalised, exactly like torch's windowed implementation.
    """
    i = jnp.arange(out_frame, dtype=dtype)[:, None]
    j = jnp.arange(in_frame, dtype=dtype)[None, :]
    in_e = jnp.asarray(in_extent, dtype)
    out_e = jnp.asarray(out_extent, dtype)
    scale = in_e / out_e
    filt_scale = jnp.maximum(scale, 1.0) if antialias else jnp.asarray(1.0, dtype)
    center = (i + 0.5) * scale
    x = (j + 0.5 - center) / filt_scale
    w = jnp.maximum(0.0, 1.0 - jnp.abs(x))
    w = jnp.where(j < in_e, w, 0.0)
    w = jnp.where(i < out_e, w, 0.0)
    return w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-12)


def resize_antialias(
    img: jax.Array,
    out_hw: tuple[int, int],
    antialias: bool = True,
) -> jax.Array:
    """torchvision ``T.Resize(out_hw, antialias=True)``-exact resize of a
    full [H, W] or [H, W, C] array (reference: the GEM heatmap resize,
    Hybridgl_main.py:201, and the COCO-instance GT resize,
    data/dataset_refer_bert.py:136, both pass antialias=True).

    Matrix form: out = Wy @ img @ Wx^T — two small dense matmuls the MXU
    eats, instead of data-dependent gathers.
    """
    return place_valid_region_antialias(img, out_hw, out_hw, antialias)


def place_valid_region_antialias(
    img: jax.Array,
    out_frame: tuple[int, int],
    dst_hw,
    antialias: bool = True,
) -> jax.Array:
    """Antialiased resize of a full [H, W(, C)] map into the (dst_h, dst_w)
    valid region of a zero-padded static frame; dst extents may be traced.

    This is the traced-shape companion of :func:`resize_antialias` used by
    the sentence stage to move the GEM heatmap into the per-image eval
    frame with torchvision ``antialias=True`` semantics (which differ from
    plain bilinear only when an image side is smaller than the heatmap)."""
    H, W = img.shape[0], img.shape[1]
    OH, OW = out_frame
    wy = _resample_weights(OH, H, H, dst_hw[0], antialias)
    wx = _resample_weights(OW, W, W, dst_hw[1], antialias)
    compute = img if jnp.issubdtype(img.dtype, jnp.floating) else img.astype(jnp.float32)
    if compute.ndim == 2:
        return wy @ compute @ wx.T
    return jnp.einsum("oh,hwc,pw->opc", wy, compute, wx)


def _composed_axis_weights(
    out_frame: int,
    n_src: int,
    mid_frame: int,
    mid_extent,
    dst_origin,
    dst_extent,
):
    """Dense [out_frame, n_src] matrix composing the pipeline's two-stage
    bilinear chain along one axis:

      stage 1: n_src samples -> mid_frame uniform bilinear upscale
               (``upscale_logits_to_input_frame``: full-frame, half-pixel);
      stage 2: the mid frame's first ``mid_extent`` samples -> a
               ``dst_extent`` window placed at ``dst_origin``
               (``place_region`` with src_origin 0).

    The composition is EXACT: each stage-2 tap (an integer mid-frame pixel)
    contributes its own stage-1 two-tap row, with clip/boundary handling
    identical to the gather formulation (coinciding taps sum their
    weights, which equals the gather's degenerate lerp). Built as a dense
    matrix so the resize runs as two MXU matmuls — the per-candidate
    row/column gathers of the direct formulation measured ~82 ms per
    [192, 1024^2] chunk on v5e, two orders off memory speed.
    """
    f32 = jnp.float32
    mid_e = jnp.asarray(mid_extent, f32)
    i = jnp.arange(out_frame, dtype=f32)
    c2 = jnp.clip(
        (i - jnp.asarray(dst_origin, f32) + 0.5)
        * (mid_e / jnp.asarray(dst_extent, f32))
        - 0.5,
        0.0,
        mid_e - 1.0,
    )
    f = jnp.floor(c2)
    wy = (c2 - f)[:, None]
    j = jnp.arange(n_src, dtype=f32)[None, :]
    scale1 = n_src / mid_frame
    rows = jnp.zeros((out_frame, n_src), f32)
    for tap, w in ((f, 1.0 - wy), (jnp.minimum(f + 1.0, mid_e - 1.0), wy)):
        g = jnp.clip((tap + 0.5) * scale1 - 0.5, 0.0, n_src - 1.0)[:, None]
        gf = jnp.floor(g)
        wg = g - gf
        rows = rows + w * (
            jnp.where(j == gf, 1.0 - wg, 0.0) + jnp.where(j == gf + 1.0, wg, 0.0)
        )
    return rows


def place_two_stage(
    low: jax.Array,  # [B, n, n] low-res maps (e.g. SAM 256^2 logits)
    mid_frame: int,  # the intermediate square frame (SAM img_size, 1024)
    mid_hw,  # (rh, rw): valid extent of the mid frame (traced ok)
    out_frame: tuple[int, int],
    dst_origin,  # (y0, x0) in the output frame (traced ok)
    dst_hw,  # (dh, dw) placed extent (traced ok)
    fill=0.0,
) -> jax.Array:
    """upscale_logits_to_input_frame + place_region as two batched MXU
    matmuls (exact two-stage composition; see _composed_axis_weights).

    Replaces the AMG pass-1/pass-2 chain ``up = upscale(low);
    vmap(place_region)(up)`` — same values, no [B, mid, mid] transient, no
    gathers. (reference semantics: sam.py:154-161 + utils/amg.py:255-264.)
    """
    OH, OW = out_frame
    Wy = _composed_axis_weights(OH, low.shape[-2], mid_frame, mid_hw[0], dst_origin[0], dst_hw[0])
    Wx = _composed_axis_weights(OW, low.shape[-1], mid_frame, mid_hw[1], dst_origin[1], dst_hw[1])
    compute = low if jnp.issubdtype(low.dtype, jnp.floating) else low.astype(jnp.float32)
    tmp = jnp.einsum("brc,pc->brp", compute, Wx)  # [B, n, OW]
    out = jnp.einsum("or,brp->bop", Wy, tmp)  # [B, OH, OW]
    i = jnp.arange(OH, dtype=jnp.float32)
    j = jnp.arange(OW, dtype=jnp.float32)
    y0 = jnp.asarray(dst_origin[0], jnp.float32)
    x0 = jnp.asarray(dst_origin[1], jnp.float32)
    inside = (
        (i[:, None] >= y0)
        & (i[:, None] < y0 + jnp.asarray(dst_hw[0], jnp.float32))
        & (j[None, :] >= x0)
        & (j[None, :] < x0 + jnp.asarray(dst_hw[1], jnp.float32))
    )
    return jnp.where(inside[None], out, fill)


def valid_mask(frame: tuple[int, int], hw) -> jax.Array:
    """Boolean [H, W] mask of the valid (h, w) region of a padded frame."""
    H, W = frame
    i = jnp.arange(H).reshape(H, 1)
    j = jnp.arange(W).reshape(1, W)
    return (i < jnp.asarray(hw[0], jnp.int32)) & (j < jnp.asarray(hw[1], jnp.int32))
