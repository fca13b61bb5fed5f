"""Gaussian blur as a separable depthwise convolution.

Replaces the per-image host-side ``cv2.GaussianBlur(img, (15,15), 0)``
(reference: Hybridgl_main.py:99, utils.py:309) with a device-resident op so
the global-image compositing never leaves HBM. Matches OpenCV semantics:
sigma=0 derives sigma from ksize, border REFLECT_101.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def gaussian_kernel_1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """OpenCV getGaussianKernel: sigma<=0 -> 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 15, sigma: float = 0.0) -> jnp.ndarray:
    """Blur the leading two axes of ``img`` ([H, W, ...]), reflect-101 border.

    Separable: two rank-1 convolutions instead of one 15x15 — 15x less
    compute, and XLA fuses the intermediate.
    """
    k = jnp.asarray(gaussian_kernel_1d(ksize, sigma))
    pad = ksize // 2
    orig_dtype = img.dtype
    x = img.astype(jnp.float32)

    # rows
    xp = jnp.pad(x, [(pad, pad)] + [(0, 0)] * (x.ndim - 1), mode="reflect")
    x = sum(
        xp[i : i + x.shape[0]] * k[i] for i in range(ksize)
    )
    # cols
    xp = jnp.pad(x, [(0, 0), (pad, pad)] + [(0, 0)] * (x.ndim - 2), mode="reflect")
    x = sum(
        xp[:, i : i + img.shape[1]] * k[i] for i in range(ksize)
    )
    if jnp.issubdtype(orig_dtype, jnp.integer):
        # cv2 rounds to nearest when writing back to uint8
        x = jnp.round(x)
        x = jnp.clip(x, 0, 255)
    return x.astype(orig_dtype)
