"""CLIP text transformer (pure-functional JAX).

Equivalent to the reference's ``CLIP.encode_text``
(reference: third_party/modified_CLIP/clip/model.py:414-431), including the
optional noun-index pooling branch and the token-masked variant
(reference: model/backbone.py:34-56).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ...core.config import ClipConfig
from .layers import layer_norm, residual_attention_block


def causal_bias(context_length: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask (reference: clip/model.py:396-402)."""
    neg = jnp.finfo(jnp.float32).min
    m = jnp.triu(jnp.full((context_length, context_length), neg, dtype), k=1)
    return m[None, None]  # broadcast over [N, H, L, L]


def encode_text(
    p,
    tokens: jax.Array,
    cfg: ClipConfig,
    target_noun_index: Optional[jax.Array] = None,
    masking_index: Optional[Sequence[int]] = None,
    masking_block: int = 11,
):
    """tokens: [N, 77] int32 -> [N, embed_dim] text features.

    ``target_noun_index`` pools at index+1 instead of EOT (the reference's
    modification, clip/model.py:425-427). ``masking_index`` zeroes those
    token rows from ``masking_block`` on (reference: model/backbone.py:34-56;
    defined but unused by the shipped drivers — provided for API parity).
    """
    dt = p["token_embedding"].dtype
    x = jnp.asarray(p["token_embedding"])[tokens].astype(dt)  # [N, 77, D]
    x = x + p["positional_embedding"].astype(dt)
    bias = causal_bias(cfg.context_length)
    if masking_index is None and "blocks_stacked" in p:
        from .layers import scan_blocks

        x = scan_blocks(p["blocks_stacked"], x, cfg.text_heads, attn_bias=bias)
    else:
        if "blocks" in p:
            blocks = p["blocks"]
        else:  # stacked-only params (the pipeline's serving pytree)
            st = p["blocks_stacked"]
            n = jax.tree.leaves(st)[0].shape[0]
            blocks = [jax.tree.map(lambda a: a[i], st) for i in range(n)]
        for i, blk in enumerate(blocks):
            if masking_index is not None and i >= masking_block:
                idx = jnp.asarray([j + 1 for j in masking_index], jnp.int32)
                x = x.at[:, idx, :].set(0.0)
            x = residual_attention_block(blk, x, cfg.text_heads, bias)
    x = layer_norm(p["ln_final"], x)
    if target_noun_index is not None:
        pool = jnp.asarray(target_noun_index) + 1
    else:
        pool = tokens.argmax(axis=-1)  # EOT has the highest token id
    x = jnp.take_along_axis(x, pool.reshape(-1, 1, 1), axis=1)[:, 0, :]
    # f32 features at the boundary (see vit.vit_head)
    return (x @ p["text_projection"].astype(x.dtype)).astype(jnp.float32)
