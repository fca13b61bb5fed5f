"""Flash-style token->image cross-attention for the SAM decoder.

The t2i side (reference: transformer.py:76-83 ``cross_attn_token_to_image``)
has ~7 query tokens against S = 4096 image keys, side-switched so the image
stream is only READ (models/sam/decoder.py:_t2i_attn):

    scores[(h,t), k] = qw_b[(h,t), :] . (keys[k] + pe[k])        (scaled)
    attn             = softmax over k
    ctx[(h,t), :]    = attn @ keys

The XLA chain materialises the [B, h, T, S] f32 scores twice (logits +
softmax) and reads the [B, S, C] kpe stream per use. This kernel streams
the image tiles once with an online softmax over k (the flash recurrence,
transposed: running max/denominator per (h, t) COLUMN), adds the shared
positional encoding in VMEM (kpe is never materialised in HBM), and
returns the tiny ctx [B, GT, C] for the token-side epilogue.

Padding (h, t) columns carry zero score weights — they softmax to uniform
attention over k and are sliced away by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    keys_ref,  # [1, St, C]
    pe_ref,  # [1, St, C] shared positional encoding tile
    qw_ref,  # [1, C, GT] f32 score weights (W_q W_k^T q, scale folded)
    o_ref,  # [1, GT, C] f32 ctx output
    m_scr,  # [GT, 1] f32 (transposed running max lives as rows)
    l_scr,  # [GT, 1] f32
    acc_scr,  # [GT, C] f32
    *,
    nk: int,
):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    keys = keys_ref[0]
    kpe = (keys.astype(jnp.float32) + pe_ref[0].astype(jnp.float32)).astype(
        keys.dtype
    )
    s = jnp.dot(
        kpe, qw_ref[0].astype(keys.dtype), preferred_element_type=jnp.float32
    )  # [St, GT]
    tile_max = jnp.max(s, axis=0, keepdims=True)  # [1, GT]
    m_prev = m_scr[:]  # [GT, 1]
    m_new = jnp.maximum(m_prev, tile_max.T)
    p = jnp.exp(s - m_new.T)  # [St, GT]
    alpha = jnp.exp(m_prev - m_new)  # [GT, 1]
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=0, keepdims=True).T
    # ctx update: p^T @ keys via a contraction over the tile axis
    pk = jax.lax.dot_general(
        p.astype(keys.dtype),
        keys,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [GT, C]
    acc_scr[:] = acc_scr[:] * alpha + pk
    m_scr[:] = m_new

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = acc_scr[:] * (1.0 / jnp.maximum(l_scr[:], 1e-30))


@functools.partial(jax.jit, static_argnames=("interpret",))
def t2i_ctx(
    keys: jax.Array,  # [B, S, C] raw image stream
    pe: jax.Array,  # [1 or B, S, C] positional encoding (added in VMEM)
    qw: jax.Array,  # [B, C, GT] f32: per-prompt score weights, scale folded
    interpret: bool | None = None,
) -> jax.Array:
    """Returns ctx [B, GT, C] f32 = softmax_k(qw . (keys+pe)) @ keys."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, S, C = keys.shape
    GT = qw.shape[-1]
    assert qw.shape == (B, C, GT), (qw.shape, (B, C, GT))
    St = S
    for cand in (2048, 1024, 512, 256):
        if S % cand == 0 and S >= cand:
            St = cand
            break
    nk = S // St
    pe_bcast = pe.shape[0] == 1
    kernel = functools.partial(_kernel, nk=nk)
    return pl.pallas_call(
        kernel,
        grid=(B, nk),
        in_specs=[
            pl.BlockSpec((1, St, C), lambda b, k: (b, k, 0)),
            pl.BlockSpec((1, St, C), lambda b, k: (0 if pe_bcast else b, k, 0)),
            pl.BlockSpec((1, C, GT), lambda b, k: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, GT, C), lambda b, k: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, GT, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((GT, 1), jnp.float32),
            pltpu.VMEM((GT, 1), jnp.float32),
            pltpu.VMEM((GT, C), jnp.float32),
        ],
        interpret=interpret,
    )(keys, pe, qw.astype(jnp.float32))
