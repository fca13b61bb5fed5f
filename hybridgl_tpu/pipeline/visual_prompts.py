"""Visual prompting utilities (device-side).

API parity with the reference's prompt helpers (reference:
utils.py:270-352): blur-background, ellipse ("circle") outline, blackout,
mask->center/size, mask->RGB, gaussian noise. The blur variant is what the
shipped drivers inline (Hybridgl_main.py:99-113); the rest exist for users
of the reference utility surface. All are jnp ops (vmap-friendly).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..kernels.blur import gaussian_blur


def mask2chw(mask: jax.Array):
    """(center_y, center_x), height, width of a boolean mask
    (reference: utils.py:280-289). Traced-friendly (returns scalars)."""
    m = mask.astype(jnp.float32)
    total = jnp.maximum(m.sum(), 1.0)
    H, W = mask.shape
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    cy = jnp.floor((m.sum(1) * ys).sum() / total).astype(jnp.int32)
    cx = jnp.floor((m.sum(0) * xs).sum() / total).astype(jnp.int32)
    in_h = mask.any(axis=1)
    in_w = mask.any(axis=0)
    hh = jnp.max(jnp.where(in_h, jnp.arange(H), -1)) - jnp.min(
        jnp.where(in_h, jnp.arange(H), H)
    ) + 1
    ww = jnp.max(jnp.where(in_w, jnp.arange(W), -1)) - jnp.min(
        jnp.where(in_w, jnp.arange(W), W)
    ) + 1
    return (cy, cx), hh, ww


def mask2img(mask: jax.Array) -> jax.Array:
    """bool [H, W] -> uint8 [H, W, 3] (reference: utils.py:270-278)."""
    g = mask.astype(jnp.uint8) * 255
    return jnp.stack([g, g, g], axis=-1)


def apply_visual_prompts(
    image: jax.Array,  # [H, W, 3] uint8/float
    mask: jax.Array,  # [H, W] bool
    visual_prompt_type: Sequence[str] = ("circle",),
    color: Tuple[int, int, int] = (255, 0, 0),
    thickness: float = 1.0,
    blur_ksize: int = 15,
) -> jax.Array:
    """Blur-background / ellipse-outline / blackout prompting
    (reference: utils.py:292-345)."""
    img = image.astype(jnp.float32)
    m = mask.astype(jnp.float32)[..., None]
    out = img

    if "blur" in visual_prompt_type:
        blurred = jnp.round(gaussian_blur(img, blur_ksize))
        out = out * m + blurred * (1.0 - m)

    if "circle" in visual_prompt_type:
        (cy, cx), hh, ww = mask2chw(mask)
        H, W = mask.shape
        ys = (jnp.arange(H, dtype=jnp.float32) - cy)[:, None]
        xs = (jnp.arange(W, dtype=jnp.float32) - cx)[None, :]
        a = jnp.maximum(ww.astype(jnp.float32) / 2.0, 1.0)
        b = jnp.maximum(hh.astype(jnp.float32) / 2.0, 1.0)
        # normalized radial distance; ring of ~`thickness` px around r == 1
        r = jnp.sqrt((xs / a) ** 2 + (ys / b) ** 2)
        band = jnp.abs(r - 1.0) * jnp.minimum(a, b) <= thickness
        out = jnp.where(band[..., None], jnp.asarray(color, jnp.float32), out)

    if "black" in visual_prompt_type:
        out = out * m

    return out.astype(image.dtype)


def gen_gauss_img(key: jax.Array, mean: float, sigma: float, image: jax.Array):
    """Additive gaussian noise, clipped to [0, 255]
    (reference: utils.py:347-352)."""
    noise = mean + sigma * jax.random.normal(key, image.shape, jnp.float32)
    return jnp.clip(image.astype(jnp.float32) + noise, 0.0, 255.0)
