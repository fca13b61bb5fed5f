"""Mask/box analytics used by the proposal engine — all fixed-shape XLA.

Replaces the reference's mixed host/device utilities
(reference: third_party/segment-anything/segment_anything/utils/amg.py):
stability score, batched mask->box, box IoU, crop-edge filtering — without
any host sync or dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stability_score(
    logits: jax.Array, mask_threshold: float, offset: float
) -> jax.Array:
    """IoU between the +offset and -offset thresholdings of mask logits.

    logits: [..., H, W] -> [...]. (reference: utils/amg.py:156-176; one
    thresholding always contains the other, so intersection/union are just
    the two areas.)
    """
    hi = (logits > (mask_threshold + offset)).sum(axis=(-2, -1))
    lo = (logits > (mask_threshold - offset)).sum(axis=(-2, -1))
    return hi.astype(jnp.float32) / lo.astype(jnp.float32)


def mask_to_box(masks: jax.Array) -> jax.Array:
    """Boolean [..., H, W] -> XYXY boxes [..., 4]; empty masks -> zeros.

    (reference math: utils/amg.py:303-346.)
    """
    m = masks.astype(bool)
    return box_from_profiles(m.any(axis=-1), m.any(axis=-2))


def box_from_profiles(in_h: jax.Array, in_w: jax.Array) -> jax.Array:
    """XYXY boxes from row/column occupancy profiles — identical math to
    :func:`mask_to_box` given in_h = mask.any(-1), in_w = mask.any(-2).

    in_h: [..., H] bool, in_w: [..., W] bool -> [..., 4] f32.
    """
    H = in_h.shape[-1]
    W = in_w.shape[-1]
    hh = jnp.arange(H)
    ww = jnp.arange(W)
    bottom = jnp.max(jnp.where(in_h, hh, -1), axis=-1)
    top = jnp.min(jnp.where(in_h, hh, H), axis=-1)
    right = jnp.max(jnp.where(in_w, ww, -1), axis=-1)
    left = jnp.min(jnp.where(in_w, ww, W), axis=-1)
    empty = ~in_h.any(axis=-1)
    box = jnp.stack([left, top, right, bottom], axis=-1).astype(jnp.float32)
    return jnp.where(empty[..., None], 0.0, box)


def box_iou_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU of XYXY boxes, [N, 4] x [M, 4] -> [N, M] (torchvision
    box_iou convention: width = x2 - x1, no +1)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def mask_iou_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU of boolean masks [N, H, W] x [M, H, W] -> [N, M].

    Computed via one matmul over flattened masks (MXU-friendly)."""
    af = a.reshape(a.shape[0], -1).astype(jnp.float32)
    bf = b.reshape(b.shape[0], -1).astype(jnp.float32)
    inter = af @ bf.T
    area_a = af.sum(-1)[:, None]
    area_b = bf.sum(-1)[None, :]
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def box_near_crop_edge(
    boxes: jax.Array, crop_box, orig_box, atol: float = 20.0
) -> jax.Array:
    """Boxes (XYXY, already uncropped to the original frame) near their crop
    edge but not near the image edge (reference: utils/amg.py:78-88)."""
    crop = jnp.asarray(crop_box, jnp.float32)
    orig = jnp.asarray(orig_box, jnp.float32)
    near_crop = jnp.abs(boxes - crop[None]) <= atol
    near_img = jnp.abs(boxes - orig[None]) <= atol
    return jnp.any(near_crop & ~near_img, axis=-1)


def box_xyxy_to_xywh(boxes: jax.Array) -> jax.Array:
    return jnp.stack(
        [
            boxes[..., 0],
            boxes[..., 1],
            boxes[..., 2] - boxes[..., 0],
            boxes[..., 3] - boxes[..., 1],
        ],
        axis=-1,
    )
