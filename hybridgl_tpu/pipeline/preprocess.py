"""Device-resident global/local crop preprocessing.

Replaces the reference's per-mask host loop of cv2/PIL work
(reference: Hybridgl_main.py:92-125) with batched on-device ops:

  global view  sharp in-mask pixels + gaussian-blurred background,
               resized to 224^2, ImageNet-normalized (Hybridgl_main.py:99-118)
  local view   ImageNet-normalized image inside the mask, CLIP pixel-mean
               fill outside (note: the reference adds the *raw-space* CLIP
               mean to a *normalized* image — a quirk we reproduce),
               resized to 224^2 (Hybridgl_main.py:93,120-122)

The image is blurred once; P mask composites are a vmapped elementwise
select that XLA fuses with the resize gathers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..kernels.blur import gaussian_blur
from ..kernels.resize import resize_bilinear

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
CLIP_PIXEL_MEAN = (0.48145466, 0.4578275, 0.40821073)


def reflect_fill(img: jax.Array, hw) -> jax.Array:
    """Mirror the valid (h, w) region into the padding (reflect-101).

    cv2.GaussianBlur reflects at the true image border; blurring the
    zero-padded canonical frame directly would bleed black into background
    pixels near the right/bottom edges. Mirroring the first rows/cols of
    padding reproduces the cv2 border for any kernel radius < h, w.
    """
    H, W = img.shape[0], img.shape[1]
    h = jnp.asarray(hw[0], jnp.int32)
    w = jnp.asarray(hw[1], jnp.int32)
    i = jnp.arange(H)
    j = jnp.arange(W)
    ri = jnp.clip(jnp.where(i < h, i, 2 * h - 2 - i), 0, h - 1)
    rj = jnp.clip(jnp.where(j < w, j, 2 * w - 2 - j), 0, w - 1)
    return img[ri][:, rj]


def build_crops(
    image_u8: jax.Array,  # [C, C, 3] canonical frame, uint8
    masks: jax.Array,  # [P, C, C] bool
    hw,  # valid (h, w); traced scalars ok
    crop_size: int = 224,
    blur_ksize: int = 15,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (global_imgs, local_imgs), each [P, crop, crop, 3] float32."""
    img = image_u8.astype(jnp.float32)
    blurred = gaussian_blur(reflect_fill(img, hw), blur_ksize)  # cv2-equivalent

    imagenet_mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    imagenet_std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    clip_mean = jnp.asarray(CLIP_PIXEL_MEAN, jnp.float32)

    def per_mask(mask):
        m = mask.astype(jnp.float32)[..., None]
        # --- global: sharp foreground + blurred background, then resize ---
        # (cv2 writes the blurred background back as uint8 before adding;
        # float compose differs by <1 grey level)
        composite = img * m + jnp.round(blurred * (1.0 - m))
        g = resize_bilinear(composite, (crop_size, crop_size), src_hw=hw)
        g = (g - imagenet_mean) / imagenet_std

        # --- local: normalized image in-mask, raw CLIP mean outside ------
        norm = (img - imagenet_mean) / imagenet_std
        local_full = norm * m + (1.0 - m) * clip_mean
        l = resize_bilinear(local_full, (crop_size, crop_size), src_hw=hw)
        return g, l

    return jax.vmap(per_mask)(masks)
