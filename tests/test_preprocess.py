"""Device crop preprocessing vs a numpy/cv2 restatement of the reference
per-mask loop (Hybridgl_main.py:92-125)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hybridgl_tpu.pipeline.preprocess import (
    CLIP_PIXEL_MEAN,
    IMAGENET_MEAN,
    IMAGENET_STD,
    build_crops,
    reflect_fill,
)

cv2 = pytest.importorskip("cv2")
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def torch_resize(x_chw, size):
    return F.interpolate(x_chw[None], size, mode="bilinear", align_corners=False)[0]


def reference_crops(img_u8, masks, crop=32, ksize=15):
    """Numpy/torch restatement of the reference global/local prep."""
    blurred = cv2.GaussianBlur(img_u8.copy(), (ksize, ksize), 0)
    mean = np.array(IMAGENET_MEAN, np.float32)
    std = np.array(IMAGENET_STD, np.float32)
    clip_mean = np.array(CLIP_PIXEL_MEAN, np.float32)
    norm = (img_u8.astype(np.float32) / 255.0 - mean) / std

    globals_, locals_ = [], []
    for m in masks:
        mm = m.astype(np.uint8)
        sharp = cv2.bitwise_and(img_u8, img_u8, mask=mm)
        inv = 1 - mm
        blurred_region = (blurred * inv[:, :, None]).astype(np.uint8)
        g = cv2.add(sharp, blurred_region)
        g = torch.from_numpy(g.astype(np.float32) / 255.0).permute(2, 0, 1)
        g = torch_resize(g, (crop, crop))
        g = (g - torch.tensor(mean).view(3, 1, 1)) / torch.tensor(std).view(3, 1, 1)
        globals_.append(g.permute(1, 2, 0).numpy())

        l = norm * m[:, :, None] + (1 - m[:, :, None]) * clip_mean
        l = torch_resize(torch.from_numpy(l).permute(2, 0, 1), (crop, crop))
        locals_.append(l.permute(1, 2, 0).numpy())
    return np.stack(globals_), np.stack(locals_)


def test_build_crops_matches_reference(rng):
    h, w, C = 40, 48, 64
    img = np.zeros((C, C, 3), np.uint8)
    img[:h, :w] = rng.integers(0, 255, (h, w, 3), np.uint8)
    masks = np.zeros((3, C, C), bool)
    masks[0, 5:20, 5:25] = True
    masks[1, 10:35, 20:45] = True
    masks[2, :h, :w] = rng.random((h, w)) > 0.5

    g, l = build_crops(jnp.asarray(img), jnp.asarray(masks), (h, w), crop_size=32)
    rg, rl = reference_crops(img[:h, :w], masks[:, :h, :w], crop=32)

    # uint8 rounding in the cv2 path + bilinear coord precision -> small slack
    np.testing.assert_allclose(np.asarray(g), rg, atol=3e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(l), rl, atol=3e-2, rtol=1e-2)


def test_reflect_fill():
    img = np.zeros((8, 8), np.float32)
    img[:4, :4] = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = np.asarray(reflect_fill(jnp.asarray(img), (4, 4)))
    # row 4 mirrors row 2, row 5 mirrors row 1 (reflect-101)
    np.testing.assert_array_equal(out[4, :4], img[2, :4])
    np.testing.assert_array_equal(out[5, :4], img[1, :4])
    np.testing.assert_array_equal(out[:4, 4], img[:4, 2])
