"""Fused SAM mask-decoder tail: upscale deconvs + hypernetwork contraction.

The decoder's tail (reference: mask_decoder.py:53-59,136-144) is

    x = gelu(LN2d(deconv1(src)))        # 2x2/s2: C -> C/4, 2x upsample
    x = gelu(deconv2(x))                #        C/4 -> C/8, 2x upsample
    masks[m] = hyper[m] . x             # per-token channel contraction

Both deconvs have kernel == stride == 2, so each is a per-pixel matmul and
the spatial interleave is a pure permutation. The XLA formulation (blocked
einsums) materialises ~2 GB of intermediates per 128-prompt chunk whose
minor dims are 32-lane / 2-sublane — ~6% tile occupancy — and measured
~25 ms of a ~32 ms decode chunk on v5e.

This kernel runs the whole tail in VMEM as three row-parallel MXU matmuls
over [rows, lanes]-shaped blocks (every lane dim a multiple of 128 at SAM
shapes):

    d [r, (i,j,c4)]       = src[r] @ W1c           + b1c  -> LN -> gelu
                            (W1c group-mean-centered: d IS the LN-centered
                             activation, see center_w1)
    z2[r, (i,j,e,f,c8)]   = z1[r] @ kron(I4, W2)   + b2   -> gelu
    y [r, (i,j,e,f,m)]    = z2[r] @ kron(I16, H_b)

where r = (h, w) runs over the g*g grid, (i, j) / (e, f) are the two 2x2
upsampling steps and H_b is prompt b's hypernetwork output. The LN group
reduction over c4 rides two tiny indicator matmuls (no in-kernel reshape).
The only HBM traffic is src in ([B, g^2, C]) and y out ([B, g^2, 16*m]);
the caller finishes with ONE XLA transpose to the interleaved
[B, m, 4g, 4g] frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LN_EPS = 1e-6  # mask_decoder's LayerNorm2d (common.py) uses eps=1e-6
_INV_SQRT2 = 2.0**-0.5


# erf(x)/x as a degree-10 polynomial in u = (x^2 - 5.12)/5.12 (power basis
# from a Chebyshev fit on |x| <= 3.2, low -> high). Division- and exp-free:
# a gelu=identity A/B measured the erf at ~20% of the WHOLE decode scan, and
# both the A&S 7.1.26 form (exp) and XLA's rational form (divide) spend
# most of that in one transcendental/iterative VPU op. Each dropped degree
# is one VPU FMA per element over the kernel's ~200M gelu elements/chunk;
# the clamp radius 3.2 (erf(3.2) = 1 - 6e-6) trades its saturation error
# against fit degree. |err| <= 1.4e-5 in f32 evaluation over the full line
# — ~14x below the 2e-4-class tolerances of the decoder goldens and well
# below bf16 resolution (the previous degree-14 fit at 1.5e-6 measured the
# same goldens; the extra 4 FMAs bought nothing observable).
_ERF_CLAMP = 3.2
_ERF_HALF = _ERF_CLAMP * _ERF_CLAMP / 2.0  # u = (x^2 - 2h)/... see _erf
_ERF_POLY = (
    0.44133382451665404,
    -0.2173052971332483,
    0.15437519694859358,
    -0.11368417777976207,
    0.08044820366229209,
    -0.05456761164045946,
    0.033728220429645545,
    -0.015443147311422394,
    0.007285535289394676,
    -0.00693757249584703,
    0.0032693081065996105,
)


def _erf(x):
    """float32-accurate erf from supported Mosaic ops (no erf primitive in
    the Pallas TPU lowering): pure-polynomial Horner evaluation, no exp or
    divide (see _ERF_POLY)."""
    x = jnp.clip(x, -_ERF_CLAMP, _ERF_CLAMP)
    u = (x * x - _ERF_HALF) * jnp.float32(1.0 / _ERF_HALF)
    acc = jnp.float32(_ERF_POLY[-1])
    for c in _ERF_POLY[-2::-1]:
        acc = acc * u + jnp.float32(c)
    return acc * x


def _gelu_exact(x):
    # torch nn.GELU default: x * Phi(x) with the (erf-form) gaussian CDF
    return 0.5 * x * (1.0 + _erf(x * _INV_SQRT2))


def center_w1(w1: jax.Array, b1: jax.Array, c4: int):
    """Fold the LN group-mean subtraction into deconv1 (exact affine
    reassociation; stack/prep-time): column c of the returned weights is
    w1[:, c] minus the mean over c's (i, j) group's c4 columns, so
    src @ w1c + b1c yields the group-centered activations directly and the
    kernel skips the two 4-lane-wide (128-padded) indicator matmuls."""
    f32 = jnp.float32
    C = w1.shape[0]
    wg = w1.astype(f32).reshape(C, 4, c4)
    w1c = (wg - wg.mean(axis=-1, keepdims=True)).reshape(C, 4 * c4)
    bg = b1.astype(f32).reshape(4, c4)
    b1c = (bg - bg.mean(axis=-1, keepdims=True)).reshape(4 * c4)
    return w1c.astype(w1.dtype), b1c


def _kernel(
    src_ref,  # [1, BR, C]
    w1_ref,  # [C, 4*c4] GROUP-MEAN-CENTERED deconv1 (see _center_w1)
    b1_ref,  # [1, 4*c4] f32 centered bias
    g_ref,  # [4*c4, 4] f32 group indicator
    g2_ref,  # [4, 4*c4] f32 group broadcast, LN-SCALE-FOLDED (row j carries
    #          ln_scale in group j's columns) — the broadcast matmul emits
    #          r[g(c)] * s[c] directly, one fewer [BR, 4*c4] VPU multiply
    t_ref,  # [1, 4*c4] f32 LN bias
    w2_ref,  # [4*c4, 16*c8]
    b2_ref,  # [1, 16*c8] f32
    h_ref,  # [1, 16*c8, 16*m] this prompt's block-diagonal hyper
    o_ref,  # [1, BR, 16*m] f32
    *,
    c4: int,
):
    # NOTE (measured): splitting the block into independent row strips so
    # the scheduler could overlap strip s+1's matmuls with strip s's
    # LN/gelu measured neutral-to-worse (321 -> 323-327 ms on the decode
    # scan at strips 2/4/8) — Mosaic issues the chain in order either way.
    src = src_ref[0]
    dt = src.dtype
    # w1/b1 arrive CENTERED (column c minus its c4-group's mean column), so
    # the matmul yields the LN-centered activations directly:
    #   d[r, c] = z1[r, c] - mean_{c' in grp(c)} z1[r, c']
    # — the group-mean indicator matmul and its broadcast-back both padded
    # their 4-wide minor dim to 128 MXU lanes, costing as much as half the
    # z1 matmul each; folding the subtraction into the weights at prep time
    # removes both (exact affine reassociation).
    d = jnp.dot(src, w1_ref[...], preferred_element_type=jnp.float32)
    d = d + b1_ref[0]
    # variance per c4-channel group via one indicator matmul; rsqrt on the
    # [BR, 4] group stats BEFORE the broadcast matmul (identical values,
    # ~c4x fewer rsqrt lanes)
    var = jnp.dot(d * d, g_ref[...], preferred_element_type=jnp.float32) / c4
    r = jax.lax.rsqrt(var + LN_EPS)
    z1n = (
        d * jnp.dot(r, g2_ref[...], preferred_element_type=jnp.float32)
        + t_ref[0]
    )
    h1 = _gelu_exact(z1n).astype(dt)
    z2 = jnp.dot(h1, w2_ref[...], preferred_element_type=jnp.float32) + b2_ref[0]
    h2 = _gelu_exact(z2).astype(dt)
    o_ref[0] = jnp.dot(h2, h_ref[0], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def upscale_hyper_blocked(
    src: jax.Array,  # [B, g*g, C] transformer keys
    w1: jax.Array,  # [C, 4*c4]  deconv1 as (i, j, c4) columns, CENTERED
    #              (center_w1: each column minus its c4-group mean column)
    b1: jax.Array,  # [4*c4] f32 (bias tiled over i, j, centered likewise)
    ln_scale: jax.Array,  # [4*c4] f32 (tiled)
    ln_bias: jax.Array,  # [4*c4] f32 (tiled)
    w2bd: jax.Array,  # [4*c4, 16*c8]  kron(I4, deconv2)
    b2: jax.Array,  # [16*c8] f32 (tiled)
    hbd: jax.Array,  # [B, 16*c8, 16*m]  kron(I16, hyper_b^T)
    interpret: bool | None = None,
) -> jax.Array:
    """Returns y [B, g*g, 16*m] f32 with columns ordered (i, j, e, f, m);
    the caller interleaves to [B, m, 4g, 4g] with one transpose."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, R, C = src.shape
    c4 = w1.shape[1] // 4
    cols = hbd.shape[-1]
    # row block: big enough to amortise the weight reads, small enough that
    # the ~8 live [BR, 512]-class f32 buffers fit the ~16 MB VMEM budget
    # (BR=2048 fits and measured 77 vs 78 us/pt decode at BR=1024 on v5e)
    BR = R
    for cand in (2048, 1024, 512, 256):
        if R % cand == 0 and R >= cand:
            BR = cand
            break
    grid = (B, R // BR)

    def _rows(b, r):
        return (b, r, 0)

    def _const(b, r):
        return (0, 0)

    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_kernel, c4=c4),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BR, C), _rows),
            pl.BlockSpec(w1.shape, _const),
            pl.BlockSpec((1,) + b1.shape, lambda b, r: (0, 0)),
            pl.BlockSpec((w1.shape[1], 4), _const),
            pl.BlockSpec((4, w1.shape[1]), _const),
            pl.BlockSpec((1,) + ln_bias.shape, lambda b, r: (0, 0)),
            pl.BlockSpec(w2bd.shape, _const),
            pl.BlockSpec((1,) + b2.shape, lambda b, r: (0, 0)),
            pl.BlockSpec((1,) + hbd.shape[1:], lambda b, r: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BR, cols), _rows),
        out_shape=jax.ShapeDtypeStruct((B, R, cols), f32),
        interpret=interpret,
    )(
        src,
        w1,
        b1[None].astype(f32),
        _group_indicator(c4, w1.dtype),
        _group_broadcast(c4, w1.dtype) * ln_scale[None].astype(f32),
        ln_bias[None].astype(f32),
        w2bd,
        b2[None].astype(f32),
        hbd,
    )


def _group_indicator(c4: int, dtype) -> jax.Array:
    """[4*c4, 4] f32: column j sums channel group j."""
    eye = np.eye(4, dtype=np.float32)
    return jnp.asarray(np.repeat(eye, c4, axis=0))


def _group_broadcast(c4: int, dtype) -> jax.Array:
    """[4, 4*c4] f32: row j broadcasts group j's statistic."""
    eye = np.eye(4, dtype=np.float32)
    return jnp.asarray(np.repeat(eye, c4, axis=1))


def interleave_blocked_masks(y: jax.Array, g: int, nmt: int) -> jax.Array:
    """y [B, g*g, (i,j,e,f,m)] f32 -> masks [B, nmt, 4g, 4g] with rows
    (h, i, e) and cols (w, j, f) — the reference deconv pixel order."""
    B = y.shape[0]
    y8 = y.reshape(B, g, g, 2, 2, 2, 2, nmt)
    return y8.transpose(0, 7, 1, 3, 5, 2, 4, 6).reshape(B, nmt, 4 * g, 4 * g)
