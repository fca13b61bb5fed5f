"""SAM composite: preprocessing + end-to-end prompted prediction.

(reference: third_party/segment-anything/segment_anything/modeling/sam.py)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...core.config import SamConfig
from ...kernels.resize import resize_bilinear
from .decoder import predict_masks
from .image_encoder import encode_image
from .prompt_encoder import dense_pe, embed_points, no_mask_dense


def get_preprocess_shape(h: int, w: int, long_side: int) -> Tuple[int, int]:
    """Longest-side resize target (reference: utils/transforms.py:93-102)."""
    scale = long_side / max(h, w)
    return int(h * scale + 0.5), int(w * scale + 0.5)


def preprocess(image: jax.Array, cfg: SamConfig) -> jax.Array:
    """[H<=1024, W<=1024, 3] uint8/float (already longest-side resized) ->
    normalized zero-padded [1024, 1024, 3] (reference: sam.py:164-174).

    The pad region receives (0 - mean)/std exactly like the reference
    (which normalizes before padding with zeros... i.e. pad value is 0 in
    normalized space). We therefore pad with zeros *after* normalizing.
    """
    mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
    std = jnp.asarray(cfg.pixel_std, jnp.float32)
    x = (image.astype(jnp.float32) - mean) / std
    ph = cfg.img_size - x.shape[0]
    pw = cfg.img_size - x.shape[1]
    return jnp.pad(x, ((0, ph), (0, pw), (0, 0)))


def preprocess_padded(image_1024: jax.Array, valid_hw, cfg: SamConfig) -> jax.Array:
    """Normalize an already-padded [1024,1024,3] frame, zeroing the pad.

    ``valid_hw`` may be traced scalars — this is the jit-friendly variant
    used by the pipeline (one static shape for every image size).
    """
    mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
    std = jnp.asarray(cfg.pixel_std, jnp.float32)
    x = (image_1024.astype(jnp.float32) - mean) / std
    i = jnp.arange(cfg.img_size)
    valid = (i[:, None] < valid_hw[0]) & (i[None, :] < valid_hw[1])
    return jnp.where(valid[..., None], x, 0.0)


def encode(p_sam, image_1024: jax.Array, cfg: SamConfig) -> jax.Array:
    """Preprocessed [1024,1024,3] -> image embedding [64, 64, prompt_dim]."""
    return encode_image(p_sam["encoder"], image_1024[None], cfg)[0]


def predict_points(
    p_sam,
    embedding: jax.Array,  # [64, 64, C]
    point_coords: jax.Array,  # [B, N, 2] in 1024-frame pixels
    point_labels: jax.Array,  # [B, N]
    cfg: SamConfig,
    multimask_output: bool = True,
    pe=None,
    dense=None,
    return_blocked: bool = False,
):
    """Batched point-prompted prediction -> (low-res logits [B,M,256,256],
    iou preds [B,M]). Mirrors SamPredictor.predict_torch
    (reference: predictor.py:168-243) without the host round-trips.
    ``return_blocked`` passes through to predict_masks (logits come back
    [B, g*g, 16*M] in the blocked upscale layout).

    ``pe``/``dense`` let loop callers (the AMG decode scan) hoist the
    chunk-invariant dense positional encoding / no-mask embedding out of
    the scan body instead of relying on XLA's while-loop LICM."""
    sparse = embed_points(p_sam["prompt"], point_coords, point_labels, cfg, pad=True)
    # dense no-mask embedding is prompt-independent -> pass it un-batched so
    # predict_masks keeps the image side shared through decoder layer 0
    if dense is None:
        dense = no_mask_dense(p_sam["prompt"], cfg, 1)[0]
    if pe is None:
        pe = dense_pe(p_sam["prompt"], cfg)
    return predict_masks(
        p_sam["decoder"],
        embedding,
        pe,
        sparse,
        cfg,
        dense_prompts=dense,
        multimask_output=multimask_output,
        return_blocked=return_blocked,
    )


def upscale_logits_to_input_frame(low_res: jax.Array, cfg: SamConfig) -> jax.Array:
    """[..., 256, 256] logits -> [..., 1024, 1024] bilinear
    (first stage of reference postprocess_masks, sam.py:154-159)."""
    lead = low_res.shape[:-2]
    flat = low_res.reshape((-1,) + low_res.shape[-2:])
    up = jax.vmap(lambda m: resize_bilinear(m, (cfg.img_size, cfg.img_size)))(flat)
    return up.reshape(lead + (cfg.img_size, cfg.img_size))
