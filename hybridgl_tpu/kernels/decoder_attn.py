"""Fused image->token cross-attention + LayerNorm for the SAM decoder.

The two-way decoder's image-side update (reference: transformer.py:96-104
``cross_attn_image_to_token`` + ``norm4``) pairs every image token (S=4096)
against the ~7 prompt tokens. With the projections side-switched onto the
token side (models/sam/decoder.py), what remains per prompt b is

    scores[q, (h,t)] = qside[b?, q, :] . W_b[:, (h,t)] + off_b[(h,t)]
    attn             = softmax over t within each head group
    out[q, :]        = attn[q, :] @ VO_b + const
    keys'[q, :]      = LayerNorm(base[b?, q, :] + out[q, :])

i.e. TWO small matmuls, a grouped softmax and an LN — but the XLA chain
materialises the [B, S, C] attention output, the residual sum and the LN
statistics as separate HBM tensors (~1 GB per 128-prompt chunk). This
kernel runs the whole update per (prompt, image-token tile) in VMEM.

Grouped softmax on the lane axis: the (h, t) columns sit in head groups of
``tp`` lanes; the in-group max uses rotate-within-group PERMUTATION
matmuls (x @ P_d for d = 1, 2, 4, ...) + elementwise max — exact, and
everything stays a 2D [tile, lanes] value. Group sums/broadcasts use 0/1
indicator matmuls (same trick as kernels/upscale_hyper.py's group LN).
Padding columns (t >= T, or lane round-up) carry off = -1e30 so their
exp is exactly 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LN_EPS = 1e-5  # decoder norms are default torch LayerNorm


def _body(
    q,
    base_ref,
    w_ref,
    off_ref,
    vo_ref,
    const_ref,
    g_ref,
    g2_ref,
    p_ref,
    s_ref,
    t_ref,
    o_ref,
    *,
    n_rot: int,
    gt: int,
):
    dt = base_ref.dtype
    s = jnp.dot(q, w_ref[0].astype(q.dtype), preferred_element_type=jnp.float32)
    s = s + off_ref[0]
    # in-group max via rotate permutations (exact; padding lanes are -1e30)
    m = s
    for r in range(n_rot):
        perm = p_ref[:, r * gt : (r + 1) * gt]
        m = jnp.maximum(m, jnp.dot(m, perm, preferred_element_type=jnp.float32))
    e = jnp.exp(s - m)
    # narrow reciprocal on the [rows, heads] group sums, then broadcast-
    # multiply (see decoder_pass._grouped_softmax_rows)
    d = jnp.dot(e, g_ref[...], preferred_element_type=jnp.float32)
    r = 1.0 / jnp.maximum(d, 1e-30)
    attn = (e * jnp.dot(r, g2_ref[...], preferred_element_type=jnp.float32)).astype(dt)
    out = jnp.dot(attn, vo_ref[0], preferred_element_type=jnp.float32)
    x = base_ref[0].astype(jnp.float32) + out + const_ref[0]
    # sufficient-statistics LN (see decoder_pass._ln_rows)
    mu = x.mean(axis=-1, keepdims=True)
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    var = jnp.maximum(ms - mu * mu, 0.0)
    o_ref[0] = (
        (x - mu) * jax.lax.rsqrt(var + LN_EPS) * s_ref[0] + t_ref[0]
    ).astype(dt)


def _kernel(qside_ref, base_ref, *rest, n_rot: int, gt: int):
    # qside_ref: [1, St, Cq] score-side stream used as-is (kpe / qproj)
    _body(qside_ref[0], base_ref, *rest, n_rot=n_rot, gt=gt)


def _kernel_pe(qside_ref, pe_ref, base_ref, *rest, n_rot: int, gt: int):
    # qside = keys; the positional encoding is added IN VMEM so the
    # [B, S, C] kpe stream never exists in HBM
    q = qside_ref[0]
    q = (q.astype(jnp.float32) + pe_ref[0].astype(jnp.float32)).astype(q.dtype)
    _body(q, base_ref, *rest, n_rot=n_rot, gt=gt)


@functools.partial(jax.jit, static_argnames=("heads", "tp", "interpret"))
def i2t_ln_update(
    qside: jax.Array,  # [B or 1, S, Cq] score-side stream (broadcast if 1)
    base: jax.Array,  # [B or 1, S, Co] residual base (broadcast if 1)
    w: jax.Array,  # [B, C, GT] score weights (scale folded; f32 or bf16)
    off: jax.Array,  # [B, GT] f32 offsets (-1e30 where t is padding)
    vo: jax.Array,  # [B, GT, C] value @ out_proj (token side)
    const: jax.Array,  # [C] out-proj bias
    ln_scale: jax.Array,  # [C]
    ln_bias: jax.Array,  # [C]
    heads: int,
    tp: int,  # padded tokens per head group; GT == heads * tp
    pe: jax.Array | None = None,  # [1 or B, S, Cq]: added to qside in VMEM
    interpret: bool | None = None,
) -> jax.Array:
    """Returns LayerNorm(base + i2t_attention(qside)) as [B, S, Co]."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B = w.shape[0]
    S, Cq = qside.shape[-2], qside.shape[-1]  # score-side width
    Co = base.shape[-1]  # output/residual width (differs when qside is
    # the pre-projected shared stream at the attention-internal dim)
    GT = heads * tp
    assert w.shape == (B, Cq, GT), (w.shape, (B, Cq, GT))
    assert vo.shape == (B, GT, Co), (vo.shape, (B, GT, Co))
    dt = base.dtype

    St = S
    for cand in (2048, 1024, 512, 256):
        if S % cand == 0 and S >= cand:
            St = cand
            break
    grid = (B, S // St)

    q_bcast = qside.shape[0] == 1
    b_bcast = base.shape[0] == 1

    # rotate-within-group permutation matrices for the in-group max
    n_rot = max(1, int(np.ceil(np.log2(tp)))) if tp > 1 else 0
    perms = []
    cols = np.arange(GT)
    g0 = (cols // tp) * tp
    for r in range(max(n_rot, 1)):
        d = 1 << r
        src = g0 + (cols - g0 + d) % tp
        P = np.zeros((GT, GT), np.float32)
        P[src, cols] = 1.0
        perms.append(P)
    p_all = jnp.asarray(np.concatenate(perms, axis=1))  # [GT, GT*n_rot]

    eye = np.eye(heads, dtype=np.float32)
    G = jnp.asarray(np.repeat(eye, tp, axis=0))  # [GT, H]
    G2 = jnp.asarray(np.repeat(eye, tp, axis=1))  # [H, GT]

    if pe is None:
        kernel = functools.partial(_kernel, n_rot=n_rot if tp > 1 else 0, gt=GT)
        pe_specs, pe_args = [], []
    else:
        kernel = functools.partial(
            _kernel_pe, n_rot=n_rot if tp > 1 else 0, gt=GT
        )
        pe_bcast = pe.shape[0] == 1
        pe_specs = [
            pl.BlockSpec((1, St, Cq), lambda b, s: (0 if pe_bcast else b, s, 0))
        ]
        pe_args = [pe.astype(dt)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, St, Cq), lambda b, s: (0 if q_bcast else b, s, 0)),
        ]
        + pe_specs
        + [
            pl.BlockSpec((1, St, Co), lambda b, s: (0 if b_bcast else b, s, 0)),
            pl.BlockSpec((1, Cq, GT), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((1, 1, GT), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((1, GT, Co), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((1, Co), lambda b, s: (0, 0)),
            pl.BlockSpec((GT, heads), lambda b, s: (0, 0)),
            pl.BlockSpec((heads, GT), lambda b, s: (0, 0)),
            pl.BlockSpec(p_all.shape, lambda b, s: (0, 0)),
            pl.BlockSpec((1, Co), lambda b, s: (0, 0)),
            pl.BlockSpec((1, Co), lambda b, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, St, Co), lambda b, s: (b, s, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, Co), dt),
        interpret=interpret,
    )(
        qside.astype(dt),
        *pe_args,
        base.astype(dt),
        w.astype(jnp.float32),
        off[:, None, :].astype(jnp.float32),
        vo.astype(dt),
        const[None].astype(jnp.float32),
        G,
        G2,
        p_all,
        ln_scale[None].astype(jnp.float32),
        ln_bias[None].astype(jnp.float32),
    )
