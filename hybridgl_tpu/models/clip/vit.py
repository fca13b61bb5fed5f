"""CLIP Vision Transformer (pure-functional JAX).

Equivalent to the reference's modified VisionTransformer
(reference: third_party/modified_CLIP/clip/model.py:272-307), including its
two load-bearing modifications:
  * blocks accept a per-call attention mask (threaded by the fusion modes);
  * ``ln_post`` + projection apply to ALL tokens, not just CLS.

The stem / per-block pieces are exposed separately because the hybrid
fusion forward (models/clip/fusion.py) drives blocks individually from
``masking_block`` onwards.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.config import ClipConfig
from .layers import layer_norm, residual_attention_block


def vit_stem(p, images: jax.Array, cfg: ClipConfig) -> jax.Array:
    """conv1 patchify -> +CLS -> +pos -> ln_pre. images: [N, H, W, 3] (NHWC).

    Returns tokens [N, 1+grid^2, width].

    Runs at the PARAM dtype (crop preprocessing emits f32; bf16 params =
    bf16 compute — the serving configuration; matmuls accumulate f32).
    """
    dt = jnp.asarray(p["conv1"]).dtype
    images = images.astype(dt)
    x = jax.lax.conv_general_dilated(
        images,
        p["conv1"].astype(dt),  # [ph, pw, 3, width]
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    N = x.shape[0]
    x = x.reshape(N, cfg.num_patches, cfg.vision_width)
    cls = jnp.broadcast_to(p["class_embedding"].astype(dt), (N, 1, cfg.vision_width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["positional_embedding"].astype(dt)
    return layer_norm(p["ln_pre"], x)


def vit_block(
    p_block,
    x,
    cfg: ClipConfig,
    attn_bias: Optional[jax.Array] = None,
    cls_bias: Optional[jax.Array] = None,
):
    return residual_attention_block(
        p_block, x, cfg.vision_heads, attn_bias, cls_bias
    )


def vit_blocks(p, x, cfg: ClipConfig, start: int = 0, stop: Optional[int] = None):
    stop = cfg.vision_layers if stop is None else stop
    if "blocks_stacked" in p:
        from .layers import scan_blocks

        return scan_blocks(p["blocks_stacked"], x, cfg.vision_heads, start=start, stop=stop)
    for i in range(start, stop):
        x = vit_block(p["blocks"][i], x, cfg)
    return x


def vit_head(p, x, cfg: ClipConfig, cls_only: bool = True):
    """ln_post (+proj). With cls_only, returns [N, embed_dim] CLS features."""
    if cls_only:
        x = x[:, 0, :]
    x = layer_norm(p["ln_post"], x)
    # features leave the trunk in f32: downstream cosine scoring and argmax
    # selection stay full-precision regardless of the serving dtype
    return (x @ p["proj"].astype(x.dtype)).astype(jnp.float32)


def encode_image(p, images, cfg: ClipConfig, cls_only: bool = True):
    """Full ViT forward; the 'crop' fusion mode path
    (reference: model/backbone.py:126-128 -> clip/model.py:289-307)."""
    x = vit_stem(p, images, cfg)
    x = vit_blocks(p, x, cfg)
    return vit_head(p, x, cfg, cls_only=cls_only)
