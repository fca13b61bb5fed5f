"""Shared transformer primitives for the CLIP family (pure-functional JAX).

Parameters are plain dict pytrees (easy torch conversion, easy sharding
annotation); all functions are shape-polymorphic over the batch and jit
under a single trace. Math matches torch ``nn.MultiheadAttention`` /
``LayerNorm`` semantics used by the reference's modified CLIP
(reference: third_party/modified_CLIP/clip/model.py:189-257).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.dtypes import score_dtype, softmax_scores


def layer_norm(p, x, eps: float = 1e-5):
    """LayerNorm computed in f32 regardless of activation dtype (matches the
    reference's fp16-safe LayerNorm subclass, clip/model.py:189-195)."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(dt)


def linear(p, x):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def use_fused_clip() -> bool:
    """Fused whole-row attention for the CLIP blocks
    (kernels/clip_attention.py). Default ON; opt OUT via
    $HYBRIDGL_FUSED_CLIP=0. Runs in interpret mode on CPU, so the
    torch-oracle test battery exercises it too."""
    from ...utils.env import env_flag

    return env_flag("HYBRIDGL_FUSED_CLIP", default=True)


def cls_bias_to_attn_bias(cls_bias: jax.Array) -> jax.Array:
    """Compact CLS-row bias [N, L] -> full additive bias [N, 1, L, L]
    (row 0 carries the bias, every other query row is unrestricted) —
    the expansion the unfused path needs."""
    N, L = cls_bias.shape
    q_is_cls = (jnp.arange(L) == 0)[None, None, :, None]
    return jnp.where(q_is_cls, cls_bias[:, None, None, :], 0.0)


def multi_head_attention(
    p,
    x: jax.Array,
    num_heads: int,
    attn_bias: Optional[jax.Array] = None,
    cls_bias: Optional[jax.Array] = None,
):
    """Self-attention matching torch nn.MultiheadAttention(d, h).

    Args:
      p: {'in_proj_w': [D, 3D], 'in_proj_b': [3D], 'out_w': [D, D], 'out_b': [D]}
      x: [N, L, D]
      attn_bias: optional additive bias broadcastable to [N, H, L, L]
        (use -inf/-1e9 entries to mask; see ``allowed_mask_to_bias``).
      cls_bias: optional compact CLS-ROW bias [N, L] — the only mask shape
        the fusion modes use (reference backbone.py:108-115). Mutually
        exclusive with attn_bias; the fused kernel consumes it natively.
    """
    N, L, D = x.shape
    H = num_heads
    hd = D // H
    from ...kernels.clip_attention import MAX_ROWS

    if attn_bias is None and L <= MAX_ROWS and use_fused_clip():
        from ...kernels.clip_attention import (
            clip_attention,
            clip_lane,
            pad_heads_proj,
            pad_in_proj,
        )

        # the head padding + q scale are folded into the projection
        # weights so the matmuls emit and consume the kernel's 128-lane
        # head groups directly, no pad/reshape ops. In the scan path the
        # per-block weights are scan-carried slices, so this reorder+pad
        # re-executes each iteration — a [D, 3D] copy, ~1e-3 of the
        # block's matmul FLOPs; pre-pad at stacking time if it ever
        # shows in traces.
        lane = clip_lane(hd, jax.default_backend() == "cpu")
        wp, bp = pad_in_proj(p["in_proj_w"], p["in_proj_b"], H, lane)
        qkv = x @ wp.astype(x.dtype) + bp.astype(x.dtype)
        ctx = clip_attention(qkv, cls_bias, H)  # [N, L, H*lane]
        ow = pad_heads_proj(p["out_w"], H, lane).astype(x.dtype)
        return ctx.astype(x.dtype) @ ow + p["out_b"].astype(x.dtype)
    qkv = x @ p["in_proj_w"].astype(x.dtype) + p["in_proj_b"].astype(x.dtype)
    if cls_bias is not None:
        assert attn_bias is None, "attn_bias and cls_bias are mutually exclusive"
        attn_bias = cls_bias_to_attn_bias(cls_bias)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    # heads stay in the [N, L, H, hd] view end-to-end: explicit
    # [N, H, L, hd] transposes materialise as layout copies of every
    # projected tensor on TPU (the 197-token L is not sublane-aligned, so
    # each copy pays a misaligned relayout); the einsum batch dims express
    # the same contraction and let XLA pick the layout (same move as
    # models/sam/decoder.py:_attn)
    q = q.reshape(N, L, H, hd)
    k = k.reshape(N, L, H, hd)
    v = v.reshape(N, L, H, hd)
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32)).astype(x.dtype)
    # scores stored at the serving dtype (core/dtypes.py policy); QK still
    # accumulates f32 on the MXU
    sdt = score_dtype(x.dtype)
    attn = jnp.einsum(
        "nqhd,nkhd->nhqk", q * scale, k, preferred_element_type=jnp.float32
    ).astype(sdt)
    if attn_bias is not None:
        attn = attn + attn_bias.astype(attn.dtype)
    attn = softmax_scores(attn).astype(x.dtype)
    out = jnp.einsum(
        "nhqk,nkhd->nqhd", attn, v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    out = out.reshape(N, L, D)
    return out @ p["out_w"].astype(x.dtype) + p["out_b"].astype(x.dtype)


def allowed_mask_to_bias(allowed: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Boolean 'may attend' mask -> additive bias (False -> -inf)."""
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, dtype)
    return jnp.where(allowed, jnp.zeros((), dtype), neg)


def residual_attention_block(
    p,
    x: jax.Array,
    num_heads: int,
    attn_bias: Optional[jax.Array] = None,
    cls_bias: Optional[jax.Array] = None,
):
    """Pre-LN block: x + MHA(LN(x)); x + MLP(LN(x)) with QuickGELU.

    Equivalent to the reference's ResidualAttentionBlock with a per-call
    attention mask (the modification that enables the fusion modes,
    reference: clip/model.py:244-257).
    """
    x = x + multi_head_attention(
        p["attn"], layer_norm(p["ln_1"], x), num_heads, attn_bias, cls_bias
    )
    h = layer_norm(p["ln_2"], x)
    h = linear(p["mlp_fc"], h)
    h = quick_gelu(h)
    h = linear(p["mlp_proj"], h)
    return x + h


def stack_block_params(blocks):
    """Scan-ready stacked weight layout; canonical implementation in
    core/params.py (re-exported here for the CLIP-side consumers)."""
    from ...core.params import stack_block_params as _impl

    return _impl(blocks)


def scan_blocks(stacked, x, num_heads, attn_bias=None, start=0, stop=None, cls_bias=None):
    """Run blocks [start, stop) of a stacked pytree via lax.scan."""
    import jax

    sl = jax.tree.map(lambda a: a[start:stop], stacked)

    def body(h, bp):
        return residual_attention_block(bp, h, num_heads, attn_bias, cls_bias), None

    return jax.lax.scan(body, x, sl)[0]
