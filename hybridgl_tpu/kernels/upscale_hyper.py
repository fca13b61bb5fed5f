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

    z1[r, (i,j,c4)]       = src[r] @ W1            + b1   -> LN -> gelu
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


# rational erf numerator/denominator in x^2 (the same clamped P(x^2)*x/Q(x^2)
# form XLA lowers f32 erf to), Horner order
_ERF_ALPHA = (
    -2.72614225801306e-10,
    2.77068142495902e-08,
    -2.10102402082508e-06,
    -5.69250639462346e-05,
    -7.34990630326855e-04,
    -2.95459980854025e-03,
    -1.60960333262415e-02,
)
_ERF_BETA = (
    -1.45660718464996e-05,
    -2.13374055278905e-04,
    -1.68282697438203e-03,
    -7.37332916720468e-03,
    -1.42647390514189e-02,
)


def _erf(x):
    """float32-accurate erf from supported Mosaic ops (no erf primitive in
    the Pallas TPU lowering). Rational P(x^2)*x / Q(x^2) on the clamped
    range [-4, 4] — the form XLA's own f32 erf lowering uses; |err| <=
    3.2e-7, below bf16 resolution and float32 round-off at gelu scales.
    Replaces an Abramowitz & Stegun 7.1.26 form whose exp() was ~24% of
    the whole upscale kernel's wall on v5e (gelu=identity A/B)."""
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = jnp.float32(_ERF_ALPHA[0])
    for c in _ERF_ALPHA[1:]:
        p = p * x2 + jnp.float32(c)
    p = p * x
    q = jnp.float32(_ERF_BETA[0])
    for c in _ERF_BETA[1:]:
        q = q * x2 + jnp.float32(c)
    return p / q


def _gelu_exact(x):
    # torch nn.GELU default: x * Phi(x) with the (erf-form) gaussian CDF
    return 0.5 * x * (1.0 + _erf(x * _INV_SQRT2))


def _kernel(
    src_ref,  # [1, BR, C]
    w1_ref,  # [C, 4*c4]
    b1_ref,  # [1, 4*c4] f32
    g_ref,  # [4*c4, 4] f32 group indicator
    g2_ref,  # [4, 4*c4] f32 group broadcast
    s_ref,  # [1, 4*c4] f32 LN scale (tiled over i,j)
    t_ref,  # [1, 4*c4] f32 LN bias
    w2_ref,  # [4*c4, 16*c8]
    b2_ref,  # [1, 16*c8] f32
    h_ref,  # [1, 16*c8, 16*m] this prompt's block-diagonal hyper
    o_ref,  # [1, BR, 16*m] f32
    *,
    c4: int,
):
    src = src_ref[0]
    dt = src.dtype
    z1 = jnp.dot(src, w1_ref[...], preferred_element_type=jnp.float32)
    z1 = z1 + b1_ref[0]
    # LayerNorm over each c4-channel group (cols are (i, j, c4)): group
    # mean/var via indicator matmuls — stays 2D, no in-kernel reshapes
    G = g_ref[...]
    G2 = g2_ref[...]
    mu = jnp.dot(z1, G, preferred_element_type=jnp.float32) / c4
    d = z1 - jnp.dot(mu, G2, preferred_element_type=jnp.float32)
    var = jnp.dot(d * d, G, preferred_element_type=jnp.float32) / c4
    z1n = (
        d
        * jax.lax.rsqrt(jnp.dot(var, G2, preferred_element_type=jnp.float32) + LN_EPS)
        * s_ref[0]
        + t_ref[0]
    )
    h1 = _gelu_exact(z1n).astype(dt)
    z2 = jnp.dot(h1, w2_ref[...], preferred_element_type=jnp.float32) + b2_ref[0]
    h2 = _gelu_exact(z2).astype(dt)
    o_ref[0] = jnp.dot(h2, h_ref[0], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def upscale_hyper_blocked(
    src: jax.Array,  # [B, g*g, C] transformer keys
    w1: jax.Array,  # [C, 4*c4]  deconv1 as (i, j, c4) columns
    b1: jax.Array,  # [4*c4] f32 (bias tiled over i, j)
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
            pl.BlockSpec((1,) + ln_scale.shape, lambda b, r: (0, 0)),
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
        _group_broadcast(c4, w1.dtype),
        ln_scale[None].astype(f32),
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
