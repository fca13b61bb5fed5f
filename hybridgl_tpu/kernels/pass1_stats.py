"""Fused AMG pass-1 statistics kernel.

Pass 1 scores every (point, mask-channel) candidate but only needs four
scalars/profiles per candidate: the two stability threshold counts
(utils/amg.py:156-176 math), the row/column occupancy profiles (for
mask_to_box), and non-emptiness. The canonical-frame logits they derive
from are a linear map of the 256^2 decoder output
(kernels/resize.py:place_two_stage), so materialising the [B, C, C]
frame in HBM (~800 MB per 192-candidate chunk, re-read by every
reduction) is pure waste.

This kernel consumes the RAW low-res logits ([B, n, n2]) plus both
composed axis matrices: the column transform runs once per candidate in
VMEM (``tmp = low @ WxT``, [n, C] — the [B, n, C] f32 half-transform is
~400 MB/chunk at the PhraseCut frame and used to round-trip HBM), then
the row matmul completes ONE ROW-TILE AT A TIME, thresholds and
accumulates in place, and writes only:

  counts   [B, 2]  f32  — #(logit > thresh+offset), #(logit > thresh-offset)
  row_any  [B, C]  f32  — 0/1 per output row:    any(logit > thresh)
  col_any  [B, C]  f32  — 0/1 per output column: any(logit > thresh)

The (y0, x0, dh, dw) placement window arrives as a dynamic SMEM vector;
pixels outside it are excluded exactly like place_two_stage's PAD_NEG
fill (reference stats frame: automatic_mask_generator.py:266-321 computes
them on the crop-frame upscaled masks — identical counts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def use_bf16_stats() -> bool:
    """Serve the pass-1 stats chain (half-transform einsum + row-resize
    matmul) on bf16 operands with f32 accumulation. Default ON; opt OUT via
    $HYBRIDGL_STATS_BF16=0.

    Why this is sound: the decoder logits the chain consumes are themselves
    f32 accumulations of bf16 matmuls (bf16 serving), so their information
    content is already bf16-grade; rounding the resize operands adds ~0.4%
    relative noise to canonical-frame logits whose threshold decisions
    (stability counts, box profiles) the serving pipeline already makes on
    bf16-grade values. Measured effect: stability |diff| ~1e-3-class, box
    edges within a pixel (tests/test_pass1_stats.py:test_bf16_stats_close).
    The win: the [B*M, n, C] half-transform HBM round-trip halves and the
    row matmul runs at full MXU bf16 rate instead of the f32 half rate."""
    from ..utils.env import env_flag

    return env_flag("HYBRIDGL_STATS_BF16", default=True)


def _stats_kernel(
    win_ref,  # SMEM [4] f32: y0, x0, dh, dw
    low_ref,  # [1, n, n2] raw decoder logits (any float dtype)
    wxt_ref,  # [n2, C] f32 column transform (same block for every program)
    wy_ref,  # [C, n] f32 (same block for every program)
    counts_ref,  # [1, 1, 128] f32 (col 0 = hi, col 1 = lo)
    rowany_ref,  # [1, 1, C] f32
    colany_ref,  # [1, 1, C] f32
    hi_scr,  # VMEM [1, C] f32
    lo_scr,  # VMEM [1, C] f32
    col_scr,  # VMEM [1, C] f32
    *,
    n: int,
    C: int,
    tile: int,
    thresh: float,
    offset: float,
    pre_half: bool = False,
):
    y0 = win_ref[0]
    x0 = win_ref[1]
    dh = win_ref[2]
    dw = win_ref[3]
    if pre_half:
        # the caller already applied the column transform (XLA folds the
        # decoder's blocked->interleaved permutation into that dot for
        # free); low_ref IS the [n, C] half-transform (native dtype — bf16
        # under use_bf16_stats, so the row dot below runs at bf16 MXU rate)
        tmp = low_ref[0]
    else:
        # column half-transform in VMEM (exactly the einsum the callers
        # used to materialise in HBM; operand dtype = wxt's)
        tmp = jnp.dot(
            low_ref[0].astype(wxt_ref.dtype),
            wxt_ref[...],
            preferred_element_type=jnp.float32,
        ).astype(wxt_ref.dtype)  # [n, C]
    # NB: tpu.iota is integer-only; cast after (f32 compares against the
    # SMEM window scalars)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1).astype(jnp.float32)
    col_ok = (col >= x0) & (col < x0 + dw)  # [1, C]

    hi_scr[:] = jnp.zeros((1, C), jnp.float32)
    lo_scr[:] = jnp.zeros((1, C), jnp.float32)
    col_scr[:] = jnp.zeros((1, C), jnp.float32)

    # Row-tiles fully outside the dynamic placement window contribute
    # exactly nothing (their `valid` mask is all-false): skip the
    # [tile, n] x [n, C] matmul and the threshold passes entirely. At
    # RefCOCO/PhraseCut image sizes (h <= ~640 of the 1024-row canonical
    # frame) this halves the row-resize FLOPs (measured 3.35 -> 2.26
    # ms/chunk at dh=480). Column-axis tiling with the same skip was
    # measured SLOWER (2.26 -> 3.11 ms/chunk at [256, 256] tiles — the 4x
    # smaller matmuls lose more MXU efficiency than the dead-column skip
    # recovers); the dead columns stay masked, not skipped.
    for t in range(C // tile):
        live_r = (jnp.float32(t * tile) < y0 + dh) & (
            jnp.float32((t + 1) * tile) > y0
        )

        @pl.when(live_r)
        def _(t=t):
            rows = wy_ref[t * tile : (t + 1) * tile, :]  # [tile, n]
            lt = jnp.dot(rows, tmp, preferred_element_type=jnp.float32)
            r = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0).astype(
                jnp.float32
            ) + float(t * tile)
            valid = ((r >= y0) & (r < y0 + dh)) & col_ok  # [tile, C]
            m_hi = jnp.where((lt > thresh + offset) & valid, 1.0, 0.0)
            m_lo = jnp.where((lt > thresh - offset) & valid, 1.0, 0.0)
            m_t = jnp.where((lt > thresh) & valid, 1.0, 0.0)
            hi_scr[:] = hi_scr[:] + m_hi.sum(axis=0, keepdims=True)
            lo_scr[:] = lo_scr[:] + m_lo.sum(axis=0, keepdims=True)
            col_scr[:] = jnp.maximum(col_scr[:], m_t.max(axis=0, keepdims=True))
            rowany_ref[0, :, t * tile : (t + 1) * tile] = m_t.max(
                axis=1, keepdims=True
            ).reshape(1, tile)

        @pl.when(jnp.logical_not(live_r))
        def _(t=t):
            rowany_ref[0, :, t * tile : (t + 1) * tile] = jnp.zeros(
                (1, tile), jnp.float32
            )

    colany_ref[0] = col_scr[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    counts_ref[0] = jnp.where(
        lane == 0, hi_scr[:].sum(), jnp.where(lane == 1, lo_scr[:].sum(), 0.0)
    )


@functools.partial(
    jax.jit, static_argnames=("thresh", "offset", "tile", "interpret")
)
def pass1_stats(
    low: jax.Array,  # [B, n, n2] raw decoder logits (bf16/f32)
    WxT: jax.Array,  # [n2, C] f32 composed column weights (transposed)
    Wy: jax.Array,  # [C, n] f32 composed row weights
    window,  # (y0, x0, dh, dw) traced scalars: placed region in the frame
    thresh: float,
    offset: float,
    tile: int = 256,
    interpret: bool | None = None,
):
    """Returns (stab [B], row_any [B, C] bool, col_any [B, C] bool).

    stab = hi/lo per the reference stability score; profiles are of the
    thresholded mask within the placement window.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, n, n2 = low.shape
    C = WxT.shape[1]
    assert WxT.shape == (n2, C), (WxT.shape, (n2, C))
    return _stats_call(
        low, WxT.astype(jnp.float32), Wy, window, thresh, offset, tile,
        interpret, pre_half=False,
    )


def _stats_call(low, WxT, Wy, window, thresh, offset, tile, interpret, *, pre_half):
    B, n, n2 = low.shape
    C = Wy.shape[0]
    assert Wy.shape == (C, n), (Wy.shape, (C, n))
    if C % tile:
        tile = C  # tiny test frames: single tile
    dt = jnp.bfloat16 if use_bf16_stats() else jnp.float32
    Wy = Wy.astype(dt)
    win = jnp.stack(
        [jnp.asarray(v, jnp.float32) for v in window]
    )  # [4]
    if pre_half:
        # the kernel never reads wxt_ref in this mode; feed a lane-wide dummy
        WxT = jnp.zeros((1, 128), dt)
        low = low.astype(dt)  # no-op when the producer already emitted dt
    else:
        WxT = WxT.astype(dt)
    kernel = functools.partial(
        _stats_kernel, n=n, C=C, tile=tile, thresh=thresh, offset=offset,
        pre_half=pre_half,
    )
    counts, row_any, col_any = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, n2), lambda b: (b, 0, 0)),
            pl.BlockSpec(WxT.shape, lambda b: (0, 0)),
            pl.BlockSpec((C, n), lambda b: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, C), jnp.float32),
            pltpu.VMEM((1, C), jnp.float32),
            pltpu.VMEM((1, C), jnp.float32),
        ],
        interpret=interpret,
    )(win, low, WxT, Wy)
    stab = counts[:, 0, 0] / jnp.maximum(counts[:, 0, 1], 1.0)
    return stab, row_any[:, 0] > 0.5, col_any[:, 0] > 0.5


def half_transform_blocked(y: jax.Array, WxT: jax.Array, g: int, nmt: int):
    """Column half-transform straight off the decoder's BLOCKED mask logits.

    ``y`` is `upscale_hyper_blocked`'s [B, g*g, 16*nmt] output (minor axis
    ordered (i, j, e, f, m)); the interleaved low-res frame it encodes has
    rows 4h+2i+e and columns 4w+2j+f. Contracting (w, j, f) against
    ``WxT`` [4g, C] reshaped [g, 2, 2, C] yields exactly
    ``interleave(y) @ WxT`` — but as a dot, so XLA folds the
    blocked->interleaved permutation into the contraction instead of
    materialising it as a strided copy (measured ~774 ms/img of pure
    relayout on the PhraseCut multicrop pass 1 when the consumer was the
    Pallas stats kernel).

    Returns [B*nmt, 4g, C] (bf16 under use_bf16_stats, else f32),
    candidate-major like the callers' flats.
    """
    B = y.shape[0]
    C = WxT.shape[1]
    assert WxT.shape[0] == 4 * g, (WxT.shape, g)
    dt = jnp.bfloat16 if use_bf16_stats() else jnp.float32
    y8 = y.reshape(B, g, g, 2, 2, 2, 2, nmt).astype(dt)
    Wxb = WxT.astype(dt).reshape(g, 2, 2, C)
    tmp = jnp.einsum(
        "bhwijefm,wjfk->bmhiek", y8, Wxb, preferred_element_type=jnp.float32
    ).astype(dt)
    return tmp.reshape(B * nmt, 4 * g, C)


def pass1_stats_half(
    tmp: jax.Array,  # [B, n, C] f32 pre-applied column half-transform
    Wy: jax.Array,  # [C, n] f32 composed row weights
    window,  # (y0, x0, dh, dw) traced scalars
    thresh: float,
    offset: float,
    tile: int = 256,
    interpret: bool | None = None,
):
    """`pass1_stats` when the column transform was already applied in XLA
    (see `half_transform_blocked`). Same returns, identical math."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _stats_call(
        tmp, None, Wy, window, thresh, offset, tile, interpret,
        pre_half=True,
    )
