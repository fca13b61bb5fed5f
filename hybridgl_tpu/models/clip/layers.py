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


def multi_head_attention(
    p,
    x: jax.Array,
    num_heads: int,
    attn_bias: Optional[jax.Array] = None,
):
    """Self-attention matching torch nn.MultiheadAttention(d, h).

    Args:
      p: {'in_proj_w': [D, 3D], 'in_proj_b': [3D], 'out_w': [D, D], 'out_b': [D]}
      x: [N, L, D]
      attn_bias: optional additive bias broadcastable to [N, H, L, L]
        (use -inf/-1e9 entries to mask; see ``allowed_mask_to_bias``).
    """
    N, L, D = x.shape
    H = num_heads
    hd = D // H
    qkv = x @ p["in_proj_w"].astype(x.dtype) + p["in_proj_b"].astype(x.dtype)
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
):
    """Pre-LN block: x + MHA(LN(x)); x + MLP(LN(x)) with QuickGELU.

    Equivalent to the reference's ResidualAttentionBlock with a per-call
    attention mask (the modification that enables the fusion modes,
    reference: clip/model.py:244-257).
    """
    x = x + multi_head_attention(p["attn"], layer_norm(p["ln_1"], x), num_heads, attn_bias)
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


def scan_blocks(stacked, x, num_heads, attn_bias=None, start=0, stop=None):
    """Run blocks [start, stop) of a stacked pytree via lax.scan."""
    import jax

    sl = jax.tree.map(lambda a: a[start:stop], stacked)

    def body(h, bp):
        return residual_attention_block(bp, h, num_heads, attn_bias), None

    return jax.lax.scan(body, x, sl)[0]
