"""Serving-dtype policy for attention score tensors.

The [*, S, S] attention score tensors are the dominant HBM/DMA traffic of
both encoders (trace-guided: tools/profile_trace.py). Matmuls always
accumulate f32 on the MXU (``preferred_element_type``); this module only
decides the *storage* dtype of the score tensor between the QK product and
the PV product:

  * f32 activations (compute_dtype="float32", the exact-parity config) ->
    f32 scores, plain softmax;
  * bf16 activations (the serving config) -> bf16 scores with an
    f32-accumulated softmax denominator. Measured end-to-end on v5e this
    is the fastest configuration (1.25 vs 1.10 img/s all-f32 vs 0.93 for
    bf16 activations + f32 scores, which pays both the f32 DMA and the
    dtype-boundary converts);
  * $HYBRIDGL_F32_SCORES=1 forces f32 scores under bf16 activations
    (a debugging/accuracy knob).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def force_f32_scores() -> bool:
    from ..utils.env import env_flag

    return env_flag("HYBRIDGL_F32_SCORES", default=False)


def score_dtype(activation_dtype):
    if activation_dtype == jnp.float32 or force_f32_scores():
        return jnp.float32
    return activation_dtype


def softmax_scores(attn: jax.Array, axes=(-1,)) -> jax.Array:
    """Numerically-stable softmax over ``axes`` (jointly) that tolerates
    bf16 scores: max-shift and exp in the score dtype, denominator
    accumulated in f32 (the accumulation and converts are no-ops for f32
    inputs)."""
    ax = tuple(axes)
    m = jax.lax.stop_gradient(attn.max(axis=ax, keepdims=True))
    e = jnp.exp(attn - m)
    s = e.sum(axis=ax, keepdims=True, dtype=jnp.float32)
    return (e.astype(jnp.float32) / s).astype(attn.dtype)


def softmax_scores2(attn: jax.Array) -> jax.Array:
    """softmax_scores over the LAST TWO axes jointly — for score tensors
    kept in their factored (…, kh, kw) view so no [S, S] relayout copy is
    ever materialised (the key-position axis is simply split in two)."""
    return softmax_scores(attn, axes=(-2, -1))
