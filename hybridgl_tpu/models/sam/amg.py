"""Automatic mask generation (AMG) as a fixed-shape jitted pipeline.

Rebuilds the reference's ``SamAutomaticMaskGenerator``
(reference: third_party/segment-anything/segment_anything/automatic_mask_generator.py)
TPU-first:

  * the whole point grid is decoded in static ``points_per_batch`` chunks
    inside one jit — no host loop, no MaskData shuttling;
  * filtering (predicted IoU, stability score, crop-edge) is validity
    masking, never dynamic shapes;
  * NMS is the XLA kernel in kernels/nms.py;
  * memory is bounded by a **two-pass design**: pass 1 scores every
    candidate but keeps only boxes/scores (mask pixels are reduced
    immediately), pass 2 re-decodes just the <=``max_proposals`` NMS
    survivors into canonical-frame masks. Recomputing the cheap decoder
    beats spilling thousands of full-resolution masks to HBM.

Masks live in the *canonical eval frame*: a [C, C] zero-padded buffer whose
top-left (h, w) region is the image at original resolution (COCO images are
<= 640px, so C=640 loses nothing). This makes every downstream stage a
static shape while matching the reference's original-resolution mask
semantics (its postprocess_masks resizes logits to (h, w) exactly the same
way — sam.py:133-162).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.config import AmgConfig, SamConfig
from ...kernels.masks import (
    box_near_crop_edge,
    mask_to_box,
    stability_score,
)
from ...kernels.nms import kept_in_score_order, nms
from ...kernels.resize import place_valid_region
from .sam import encode, predict_points, preprocess_padded, upscale_logits_to_input_frame

PAD_NEG = -1e4  # logit fill outside the valid image region


class Proposals(NamedTuple):
    """Static-shape proposal bundle in the canonical eval frame."""

    masks: jax.Array  # [P, C, C] bool
    boxes_xyxy: jax.Array  # [P, 4] f32, original-resolution coords
    iou_preds: jax.Array  # [P] f32
    stability: jax.Array  # [P] f32
    points: jax.Array  # [P, 2] f32, original-resolution coords
    areas: jax.Array  # [P] f32 (mask pixel count)
    valid: jax.Array  # [P] bool
    num: jax.Array  # scalar int32


def build_point_grid(n_per_side: int) -> np.ndarray:
    """Evenly spaced [0,1]^2 grid (reference: utils/amg.py:179-186)."""
    offset = 1 / (2 * n_per_side)
    side = np.linspace(offset, 1 - offset, n_per_side)
    px = np.tile(side[None, :], (n_per_side, 1))
    py = np.tile(side[:, None], (1, n_per_side))
    return np.stack([px, py], axis=-1).reshape(-1, 2).astype(np.float32)


def _canonical_logits(low_res, rh, rw, h, w, sam_cfg: SamConfig, canonical: int):
    """[B, 256, 256] low-res logits -> [B, C, C] canonical-frame logits.

    Two-stage bilinear exactly like the reference postprocess
    (sam.py:154-161): 256 -> 1024 frame, crop valid (rh, rw), -> (h, w).
    Padding is filled with PAD_NEG so area/stability sums ignore it.
    """
    up = upscale_logits_to_input_frame(low_res, sam_cfg)  # [B, 1024, 1024]

    def place(m):
        return place_valid_region(m, (rh, rw), (canonical, canonical), (h, w))

    placed = jax.vmap(place)(up)
    i = jnp.arange(canonical)
    valid = (i[:, None] < h) & (i[None, :] < w)
    return jnp.where(valid[None], placed, PAD_NEG)


def _chunk_points(grid01: np.ndarray, chunk: int) -> np.ndarray:
    n = grid01.shape[0]
    pad = (-n) % chunk
    if pad:
        grid01 = np.concatenate([grid01, np.zeros((pad, 2), np.float32)], axis=0)
    return grid01.reshape(-1, chunk, 2)


def generate_proposals(
    p_sam,
    image_1024: jax.Array,  # [1024, 1024, 3] uint8/float, padded frame
    rh,
    rw,  # valid extent in the 1024 frame (traced scalars ok)
    h,
    w,  # original image size (<= canonical)
    sam_cfg: SamConfig,
    amg_cfg: AmgConfig,
    canonical: int = 640,
    embedding: jax.Array | None = None,
) -> Proposals:
    """Single-crop AMG (crop_n_layers=0 — the RefCOCO configuration,
    reference: Hybridgl_main.py:68-74). Fully traceable; wrap in jax.jit
    with static sam_cfg/amg_cfg/canonical."""
    x = preprocess_padded(image_1024, (rh, rw), sam_cfg)
    if embedding is None:
        embedding = encode(p_sam, x, sam_cfg)

    grid01 = build_point_grid(amg_cfg.points_per_side)
    n_points = grid01.shape[0]
    chunks = _chunk_points(grid01, amg_cfg.points_per_batch)
    M = 3  # multimask outputs per point
    B = amg_cfg.points_per_batch

    # 1024-frame point coords: grid01 * (w, h) * (rw/w, rh/h) == grid01 * (rw, rh)
    scale_1024 = jnp.stack([jnp.asarray(rw, jnp.float32), jnp.asarray(rh, jnp.float32)])
    orig_scale = jnp.stack([jnp.asarray(w, jnp.float32), jnp.asarray(h, jnp.float32)])

    # ---- pass 1: score all candidates, keep only per-candidate scalars ----
    all_iou, all_stab, all_boxes, all_valid = [], [], [], []
    for ci in range(chunks.shape[0]):
        pts01 = jnp.asarray(chunks[ci])  # [B, 2]
        coords = (pts01 * scale_1024)[:, None, :]  # [B, 1, 2]
        labels = jnp.ones((B, 1), jnp.float32)
        low_res, iou_preds = predict_points(
            p_sam, embedding, coords, labels, sam_cfg, multimask_output=True
        )  # [B, 3, 256, 256], [B, 3]
        flat = low_res.reshape(B * M, low_res.shape[-2], low_res.shape[-1])
        logits = _canonical_logits(flat, rh, rw, h, w, sam_cfg, canonical)
        stab = stability_score(
            logits, sam_cfg.mask_threshold, amg_cfg.stability_score_offset
        )
        masks = logits > sam_cfg.mask_threshold
        boxes = mask_to_box(masks)
        valid = jnp.ones((B * M,), bool)
        if amg_cfg.pred_iou_thresh > 0:
            valid &= iou_preds.reshape(-1) > amg_cfg.pred_iou_thresh
        if amg_cfg.stability_score_thresh > 0:
            valid &= stab >= amg_cfg.stability_score_thresh
        # crop-edge filter is an identity for the single-crop configuration
        # (crop box == image box; reference: utils/amg.py:78-88) but cheap:
        wf = jnp.asarray(w, jnp.float32)
        hf = jnp.asarray(h, jnp.float32)
        img_box = jnp.stack([jnp.float32(0), jnp.float32(0), wf, hf])
        valid &= ~box_near_crop_edge(boxes, img_box, img_box)
        valid &= masks.any(axis=(-2, -1))  # drop empty masks
        all_iou.append(iou_preds.reshape(-1))
        all_stab.append(stab)
        all_boxes.append(boxes)
        all_valid.append(valid)

    iou_all = jnp.concatenate(all_iou)  # [n_cand]
    stab_all = jnp.concatenate(all_stab)
    boxes_all = jnp.concatenate(all_boxes)
    valid_all = jnp.concatenate(all_valid)
    # mask off padded grid points
    n_cand = chunks.shape[0] * B * M
    point_idx = jnp.arange(n_cand) // M
    valid_all &= point_idx < n_points

    # ---- NMS over all candidates (scores = predicted IoU, as reference) ----
    res = nms(boxes_all, iou_all, amg_cfg.box_nms_thresh, valid_all)
    P = amg_cfg.max_proposals
    kept_idx, kept_valid = kept_in_score_order(res, P)

    # ---- pass 2: re-decode only the survivors into canonical masks -------
    kept_point = kept_idx // M
    kept_channel = kept_idx % M
    grid_dev = jnp.asarray(_chunk_points(grid01, amg_cfg.points_per_batch)).reshape(
        -1, 2
    )
    pts01 = grid_dev[kept_point]  # [P, 2]
    coords = (pts01 * scale_1024)[:, None, :]
    labels = jnp.ones((P, 1), jnp.float32)
    low_res, _ = predict_points(
        p_sam, embedding, coords, labels, sam_cfg, multimask_output=True
    )  # [P, 3, 256, 256]
    sel = jnp.take_along_axis(
        low_res, kept_channel.reshape(P, 1, 1, 1), axis=1
    )[:, 0]
    logits = _canonical_logits(sel, rh, rw, h, w, sam_cfg, canonical)
    masks = (logits > sam_cfg.mask_threshold) & kept_valid[:, None, None]

    return Proposals(
        masks=masks,
        boxes_xyxy=boxes_all[kept_idx] * kept_valid[:, None],
        iou_preds=iou_all[kept_idx] * kept_valid,
        stability=stab_all[kept_idx] * kept_valid,
        points=(pts01 * orig_scale) * kept_valid[:, None],
        areas=masks.sum(axis=(-2, -1)).astype(jnp.float32),
        valid=kept_valid,
        num=res.num_kept.astype(jnp.int32).clip(0, P),
    )
