"""Pallas flash attention with decomposed relative-position bias.

The SAM image encoder's four global-attention blocks attend over
64x64 = 4096 tokens per head; materialising the [heads, 4096, 4096]
attention matrix costs ~1 GB of HBM traffic per block. This kernel
computes attention with online softmax in VMEM tiles, and folds the
decomposed rel-pos bias (reference math:
third_party/segment-anything/segment_anything/modeling/image_encoder.py:325-361)
into the tile loop without materialising it:

  bias[q, k] = rel_h[q, k // G] + rel_w[q, k % G]      (G = grid side)

The two rank-G terms (rel_h = einsum(q, Rh), rel_w = einsum(q, Rw)) are
tiny ([S, G]) and precomputed outside; inside the kernel a [TQ, TK] bias
tile is rebuilt from a [TQ, TK/G] slice of rel_h plus the [TQ, G] rel_w —
pure VPU adds, no extra HBM traffic.

Key layout choices (see pallas_guide.md):
  * k-tile = TK = n*G columns => a tile covers whole grid rows, so the
    bias tile is a concat of n shifted rel_h columns + rel_w;
  * running max/denominator/accumulator live in VMEM scratch across the
    k-tile grid dimension; output written at the last k tile;
  * softmax statistics in f32 regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, m_scr, l_scr, acc_scr, *, rows_per_ktile: int, grid_side: int, nk: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [TQ, hd] (pre-scaled)
    k = k_ref[0]  # [TK, hd]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [TQ, TK]

    # rel_h arrives transposed ([rows_per_ktile, TQ] tile) so the lane dim
    # is TQ (128-aligned); one small transpose rebuilds the [TQ, ...] view
    rh = rh_ref[0].astype(jnp.float32).T  # [TQ, rows_per_ktile]
    rw = rw_ref[0].astype(jnp.float32)  # [TQ, G]
    bias = jnp.concatenate(
        [rh[:, r : r + 1] + rw for r in range(rows_per_ktile)], axis=1
    )  # [TQ, TK]
    s = s + bias

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_scr[:] = l_scr[:] * alpha + p.sum(axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_scr[:] = m_new

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("grid_side", "block_q", "block_k", "interpret"))
def flash_attention_rel_pos(
    q: jax.Array,  # [BH, S, hd], S = grid_side**2 (pre-scaled by 1/sqrt(hd))
    k: jax.Array,
    v: jax.Array,
    rel_h: jax.Array,  # [BH, S, grid_side] bias term for the k-row axis
    rel_w: jax.Array,  # [BH, S, grid_side] bias term for the k-col axis
    grid_side: int,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    if interpret is None:
        # pallas requires interpret mode off-TPU (keeps CPU tests working)
        interpret = jax.default_backend() == "cpu"
    BH, S, hd = q.shape
    G = grid_side
    assert S == G * G, (S, G)
    assert block_k % G == 0, "k tile must cover whole grid rows"
    rows_per_ktile = block_k // G
    # the transposed rel_h tile is [rows_per_ktile, TQ]: on real TPUs the
    # sublane dim needs >= 8 rows ((8,128) tiling) unless it spans the full
    # G; interpret mode (tests with tiny grids) has no such constraint
    if not interpret:
        assert rows_per_ktile >= 8 or rows_per_ktile == G, (
            f"block_k={block_k} too small for grid_side={G}: need block_k >= 8*G"
        )
    assert S % block_q == 0 and S % block_k == 0
    nq = S // block_q
    nk = S // block_k

    kernel = functools.partial(
        _flash_kernel, rows_per_ktile=rows_per_ktile, grid_side=G, nk=nk
    )
    grid = (BH, nq, nk)
    rel_h_t = rel_h.transpose(0, 2, 1)  # [BH, G, S]: lane dim = S (aligned)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec(
                (1, rows_per_ktile, block_q), lambda b, qi, ki: (b, ki, qi)
            ),
            pl.BlockSpec((1, block_q, G), lambda b, qi, ki: (b, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, S, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, rel_h_t, rel_w)


def reference_attention_rel_pos(q, k, v, rel_h, rel_w, grid_side):
    """Unfused jnp reference (and CPU fallback): identical math."""
    BH, S, hd = q.shape
    G = grid_side
    attn = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    bias = (
        rel_h[:, :, :, None] + rel_w[:, :, None, :]
    ).reshape(BH, S, S)  # [BH, S, (kh kw)]
    attn = attn + bias.astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", attn, v, preferred_element_type=jnp.float32).astype(q.dtype)
