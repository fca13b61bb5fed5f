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
    box_from_profiles,
    box_near_crop_edge,
)
from ...kernels.nms import kept_in_score_order, nms
from ...kernels.pass1_stats import half_transform_blocked, pass1_stats_half
from ...kernels.resize import _composed_axis_weights, place_region, place_two_stage
from ...kernels.upscale_hyper import interleave_blocked_masks
from .prompt_encoder import dense_pe, embed_points, no_mask_dense
from .decoder import predict_masks
from .sam import encode, predict_points, preprocess_padded

PAD_NEG = -1e4  # logit fill outside the valid image region

# Pass-1 decode scans run with unroll=2: the decoder chunk is DMA-latency
# bound (~150 small weight/activation prefetches per chunk whose starts
# serialize against ~7 ms of real compute), and interleaving two chunks in
# one loop body lets XLA overlap one chunk's prefetches under the other's
# compute without changing any matmul shape. Measured on v5e (ViT-H,
# pps=64, B=128): 322 -> 308 us/point; unroll=4 adds nothing
# (tools/bench_decode_scan.py).
_PASS1_UNROLL = 2


def _scan_unroll(n_chunks: int) -> int:
    """lax.scan unroll factor for ``n_chunks`` iterations (must divide)."""
    return _PASS1_UNROLL if n_chunks % _PASS1_UNROLL == 0 else 1


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
    # NMS survivors silently dropped by the static buckets (max_proposals /
    # max_candidates_per_crop) — the reference keeps everything
    # (reference: automatic_mask_generator.py:197-264), so a nonzero value
    # means coverage loss the driver should warn about.
    overflow: jax.Array = np.int32(0)


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
    (sam.py:154-161): 256 -> 1024 frame, crop valid (rh, rw), -> (h, w) —
    composed into two batched MXU matmuls (kernels/resize.py:
    place_two_stage; the gather formulation measured ~82 ms per
    [192, 1024^2] chunk on v5e). Padding is filled with PAD_NEG so
    area/stability sums ignore it.
    """
    return place_two_stage(
        low_res,
        sam_cfg.img_size,
        (rh, rw),
        (canonical, canonical),
        (0, 0),
        (h, w),
        fill=PAD_NEG,
    )


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

    # Cache the 256^2 decoder logits from pass 1 when the candidate set is
    # small enough (single-crop RefCOCO: 192 x 256^2 f32 = 50 MB); pass 2
    # then gathers instead of re-running the decoder + upscaling deconvs
    # (the deconv fusions show up twice per image in device traces).
    n_cand_total = chunks.shape[0] * B * M
    cache_low_res = n_cand_total * 256 * 256 * 4 <= 256 * 1024 * 1024

    # ---- pass 1: score all candidates, keep only per-candidate scalars ----
    # scanned over point chunks; stability/box/nonempty come from the fused
    # stats kernel over the HALF-transformed logits — the [B*M, canonical^2]
    # frame is never materialised (kernels/pass1_stats.py)
    n_low = sam_cfg.embed_grid * 4  # decoder logit resolution (256 for SAM)
    S1 = sam_cfg.img_size
    Wy = _composed_axis_weights(canonical, n_low, S1, rh, 0, h)
    Wx = _composed_axis_weights(canonical, n_low, S1, rw, 0, w)

    pe_hoist = dense_pe(p_sam["prompt"], sam_cfg)  # chunk-invariant
    dense_hoist = no_mask_dense(p_sam["prompt"], sam_cfg, 1)[0]

    def chunk_body(_, pts01):
        coords = (pts01 * scale_1024)[:, None, :]  # [B, 1, 2]
        labels = jnp.ones((B, 1), jnp.float32)
        blocked, iou_preds = predict_points(
            p_sam, embedding, coords, labels, sam_cfg, multimask_output=True,
            pe=pe_hoist, dense=dense_hoist, return_blocked=True,
        )  # [B, g*g, 16*3] blocked logits, [B, 3]
        # the column half-transform contracts the BLOCKED decoder output
        # directly (XLA folds the spatial interleave into the dot; the
        # strided-copy relayout it replaces measured ~774 ms/img on the
        # multicrop trace); the row matmul + thresholds run in the kernel.
        # TRADEOFF (recorded per ADVICE r4): this materialises the
        # [B*M, 256, C] half-transform in HBM (bf16 under
        # pass1_stats.use_bf16_stats, ~C/640 * 125 MB per B=128 chunk) —
        # the buffer the old fully-in-kernel design avoided. The measured
        # 774 ms/img relayout win dominates at C<=1024; if canonical C ever
        # grows past ~2k, re-measure this choice.
        half = half_transform_blocked(blocked, Wx.T, sam_cfg.embed_grid, M)
        stab, row_any, col_any = pass1_stats_half(
            half,
            Wy,
            (0, 0, h, w),
            sam_cfg.mask_threshold,
            amg_cfg.stability_score_offset,
        )
        boxes = box_from_profiles(row_any, col_any)
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
        valid &= row_any.any(axis=-1)  # drop empty masks
        outs = (iou_preds.reshape(-1), stab, boxes, valid)
        if cache_low_res:
            # pass 2 gathers interleaved 256^2 frames; the relayout is tiny
            # at cacheable candidate counts (single-crop: ~50 MB/img)
            flat = interleave_blocked_masks(
                blocked, sam_cfg.embed_grid, M
            ).reshape(B * M, n_low, n_low)
            outs = outs + (flat,)
        return None, outs

    _, scanned = jax.lax.scan(
        chunk_body, None, jnp.asarray(chunks), unroll=_scan_unroll(chunks.shape[0])
    )
    iou_all = scanned[0].reshape(-1)  # [n_cand]
    stab_all = scanned[1].reshape(-1)
    boxes_all = scanned[2].reshape(-1, 4)
    valid_all = scanned[3].reshape(-1)
    if cache_low_res:
        all_low_res = [scanned[4].reshape((-1,) + scanned[4].shape[-2:])]
    # mask off padded grid points
    n_cand = chunks.shape[0] * B * M
    point_idx = jnp.arange(n_cand) // M
    valid_all &= point_idx < n_points

    # ---- NMS over all candidates (scores = predicted IoU, as reference) ----
    res = nms(boxes_all, iou_all, amg_cfg.box_nms_thresh, valid_all)
    P = amg_cfg.max_proposals
    kept_idx, kept_valid = kept_in_score_order(res, P)

    # ---- pass 2: survivors' masks (gather from cache, or re-decode) ------
    kept_point = kept_idx // M
    kept_channel = kept_idx % M
    grid_dev = jnp.asarray(_chunk_points(grid01, amg_cfg.points_per_batch)).reshape(
        -1, 2
    )
    pts01 = grid_dev[kept_point]  # [P, 2]
    if cache_low_res:
        sel = jnp.concatenate(all_low_res, axis=0)[kept_idx]  # [P, 256, 256]
    else:
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
        overflow=jnp.maximum(res.num_kept.astype(jnp.int32) - P, 0),
    )


# ---------------------------------------------------------------------------
# multi-crop AMG (crop_n_layers >= 1 — the PhraseCut configuration,
# reference: Hybridgl_main_PhraseCut.py:56-62, generate_crop_boxes
# utils/amg.py:200-234)
# ---------------------------------------------------------------------------


def _crop_boxes_layer1(h, w, overlap_ratio: float):
    """The four layer-1 crop boxes as traced (y0, x0, ch, cw) tuples
    (reference: utils/amg.py:200-234 with n_layers=1)."""
    hf = jnp.asarray(h, jnp.float32)
    wf = jnp.asarray(w, jnp.float32)
    short = jnp.minimum(hf, wf)
    overlap = jnp.floor(overlap_ratio * short)  # int() truncation, positive
    crop_w = jnp.ceil((overlap + wf) / 2.0)
    crop_h = jnp.ceil((overlap + hf) / 2.0)
    x0s = [jnp.float32(0.0), jnp.floor(crop_w - overlap)]
    y0s = [jnp.float32(0.0), jnp.floor(crop_h - overlap)]
    boxes = []
    for x0 in x0s:  # reference iterates product(x0s, y0s) in x-major order
        for y0 in y0s:
            x1 = jnp.minimum(x0 + crop_w, wf)
            y1 = jnp.minimum(y0 + crop_h, hf)
            boxes.append((y0, x0, y1 - y0, x1 - x0))
    return boxes


def _score_crop_candidates(
    p_sam,
    embedding,
    grid01: np.ndarray,
    crop_origin,  # (y0, x0) in canonical coords (traced)
    crop_extent,  # (ch, cw) (traced)
    crop_rhw,  # valid extent in the crop's 1024 frame (traced)
    img_hw,  # full-image (h, w)
    sam_cfg: SamConfig,
    amg_cfg: AmgConfig,
    canonical: int,
):
    """Pass-1 scoring of every (point, channel) candidate of one crop.
    Returns (iou, stab, boxes, valid, n_candidates)."""
    chunks = _chunk_points(grid01, amg_cfg.points_per_batch)
    n_points = grid01.shape[0]
    M, B = 3, amg_cfg.points_per_batch
    rh, rw = crop_rhw
    ch, cw = crop_extent
    y0, x0 = crop_origin
    h, w = img_hw
    scale_1024 = jnp.stack([jnp.asarray(rw, jnp.float32), jnp.asarray(rh, jnp.float32)])

    wf = jnp.asarray(w, jnp.float32)
    hf = jnp.asarray(h, jnp.float32)
    img_box = jnp.stack([jnp.float32(0), jnp.float32(0), wf, hf])
    x0f = jnp.asarray(x0, jnp.float32)
    y0f = jnp.asarray(y0, jnp.float32)
    crop_box = jnp.stack(
        [x0f, y0f, x0f + jnp.asarray(cw, jnp.float32), y0f + jnp.asarray(ch, jnp.float32)]
    )

    # lax.scan over the point chunks (at pps=64 x 5 crops an unrolled form
    # exceeded HBM by 70 GB at compile time); stability/box/nonempty come
    # from the fused stats kernel over the half-transformed logits — the
    # [B*M, canonical^2] frame is never materialised (kernels/pass1_stats.py)
    n_low = sam_cfg.embed_grid * 4
    S1 = sam_cfg.img_size
    Wy = _composed_axis_weights(canonical, n_low, S1, rh, y0, ch)
    Wx = _composed_axis_weights(canonical, n_low, S1, rw, x0, cw)

    pe_hoist = dense_pe(p_sam["prompt"], sam_cfg)  # chunk-invariant
    dense_hoist = no_mask_dense(p_sam["prompt"], sam_cfg, 1)[0]

    def chunk_body(_, pts01):
        coords = (pts01 * scale_1024)[:, None, :]
        labels = jnp.ones((B, 1), jnp.float32)
        blocked, iou_preds = predict_points(
            p_sam, embedding, coords, labels, sam_cfg, multimask_output=True,
            pe=pe_hoist, dense=dense_hoist, return_blocked=True,
        )
        half = half_transform_blocked(blocked, Wx.T, sam_cfg.embed_grid, M)
        stab, row_any, col_any = pass1_stats_half(
            half,
            Wy,
            (y0, x0, ch, cw),
            sam_cfg.mask_threshold,
            amg_cfg.stability_score_offset,
        )
        boxes = box_from_profiles(row_any, col_any)
        valid = jnp.ones((B * M,), bool)
        if amg_cfg.pred_iou_thresh > 0:
            valid &= iou_preds.reshape(-1) > amg_cfg.pred_iou_thresh
        if amg_cfg.stability_score_thresh > 0:
            valid &= stab >= amg_cfg.stability_score_thresh
        valid &= ~box_near_crop_edge(boxes, crop_box, img_box)
        valid &= row_any.any(axis=-1)
        return None, (iou_preds.reshape(-1), stab, boxes, valid)

    _, (iou_s, stab_s, boxes_s, valid_s) = jax.lax.scan(
        chunk_body,
        None,
        jnp.asarray(chunks),
        unroll=_scan_unroll(chunks.shape[0]),
    )
    n_cand = chunks.shape[0] * B * M
    point_idx = jnp.arange(n_cand) // M
    valid_all = valid_s.reshape(-1) & (point_idx < n_points)
    return (
        iou_s.reshape(-1),
        stab_s.reshape(-1),
        boxes_s.reshape(-1, 4),
        valid_all,
        n_cand,
    )


def generate_proposals_multicrop(
    p_sam,
    image_1024: jax.Array,  # full-image long-side-resized frame (host PIL)
    rh,
    rw,
    image_canonical: jax.Array,  # [C, C, 3] uint8, crops are cut from here
    h,
    w,
    sam_cfg: SamConfig,
    amg_cfg: AmgConfig,
    canonical: int = 1024,
) -> Proposals:
    """AMG with one crop layer (full image + 4 overlapping crops).

    Mirrors the reference flow (reference: automatic_mask_generator.py:197-264):
    per-crop candidate scoring + per-crop NMS, then cross-crop NMS scored by
    1/crop-area (smaller crops preferred), then a re-decode of the survivors.
    Per-crop survivors are capped at ``amg_cfg.max_candidates_per_crop`` (a
    bucket the reference doesn't need; sized well above typical survivor
    counts).
    """
    assert amg_cfg.crop_n_layers == 1, "only crop_n_layers in (0, 1) supported"
    M = 3
    K = amg_cfg.max_candidates_per_crop
    ds = amg_cfg.crop_n_points_downscale_factor
    grid_full = build_point_grid(amg_cfg.points_per_side)
    grid_crop = build_point_grid(max(int(amg_cfg.points_per_side / ds), 1))

    # ---- full-image crop -------------------------------------------------
    x_full = preprocess_padded(image_1024, (rh, rw), sam_cfg)
    crops = [
        dict(
            grid=grid_full,
            origin=(jnp.float32(0.0), jnp.float32(0.0)),
            extent=(jnp.asarray(h, jnp.float32), jnp.asarray(w, jnp.float32)),
            rhw=(jnp.asarray(rh, jnp.int32), jnp.asarray(rw, jnp.int32)),
        )
    ]
    frames = [x_full]
    # ---- layer-1 crops ---------------------------------------------------
    for (cy0, cx0, ch_, cw_) in _crop_boxes_layer1(h, w, amg_cfg.crop_overlap_ratio):
        S = sam_cfg.img_size
        long_side = jnp.maximum(ch_, cw_)
        scale = S / long_side
        crh = jnp.floor(ch_ * scale + 0.5).astype(jnp.int32)
        crw = jnp.floor(cw_ * scale + 0.5).astype(jnp.int32)
        # cut the crop from the canonical frame and long-side-resize it into
        # the (crh, crw) corner of a zero-padded SxS frame (the reference's
        # longest-side resize + pad, transforms.py:26-31 + sam.py:164-174)
        frame = place_region(
            image_canonical.astype(jnp.float32),
            (ch_, cw_),
            (S, S),
            (0, 0),
            (crh, crw),
            src_origin=(cy0, cx0),
        )
        frames.append(preprocess_padded(frame, (crh, crw), sam_cfg))
        crops.append(
            dict(
                grid=grid_crop,
                origin=(cy0, cx0),
                extent=(ch_, cw_),
                rhw=(crh, crw),
            )
        )
    # one jitted scan over the five frames, batch-1 each: the batched
    # [5, 1024, 1024] encoder pass measured ~95 ms/img SLOWER on v5e
    # (476 vs 380 ms for 5 frames, tools/bench_encode_batch.py BENCH_SERIAL
    # A/B) — batch-1 keeps the windowed/MLP fusions in their tuned layouts
    # and the encoder is compute-bound, so the repeated weight stream is
    # free under the compute
    from .image_encoder import encode_image

    def enc_body(_, frame):
        return None, encode_image(p_sam["encoder"], frame[None], sam_cfg)[0]

    _, embs = jax.lax.scan(enc_body, None, jnp.stack(frames))
    for crop_id in range(len(crops)):
        crops[crop_id]["embedding"] = embs[crop_id]

    # ---- pass 1 + per-crop NMS ------------------------------------------
    sel_boxes, sel_iou, sel_stab, sel_valid = [], [], [], []
    overflow = jnp.asarray(0, jnp.int32)
    sel_crop_id, sel_cand_idx, sel_inv_area = [], [], []
    for crop_id, crop in enumerate(crops):
        iou_c, stab_c, boxes_c, valid_c, n_cand = _score_crop_candidates(
            p_sam,
            crop["embedding"],
            crop["grid"],
            crop["origin"],
            crop["extent"],
            crop["rhw"],
            (h, w),
            sam_cfg,
            amg_cfg,
            canonical,
        )
        res = nms(boxes_c, iou_c, amg_cfg.box_nms_thresh, valid_c)
        kept_idx, kept_valid = kept_in_score_order(res, K)
        overflow = overflow + jnp.maximum(res.num_kept.astype(jnp.int32) - K, 0)
        sel_boxes.append(boxes_c[kept_idx])
        sel_iou.append(iou_c[kept_idx] * kept_valid)
        sel_stab.append(stab_c[kept_idx] * kept_valid)
        sel_valid.append(kept_valid)
        sel_cand_idx.append(kept_idx)
        sel_crop_id.append(jnp.full((K,), crop_id, jnp.int32))
        ch_, cw_ = crop["extent"]
        area = jnp.asarray(ch_, jnp.float32) * jnp.asarray(cw_, jnp.float32)
        sel_inv_area.append(jnp.full((K,), 1.0, jnp.float32) / area)

    boxes_all = jnp.concatenate(sel_boxes)
    iou_all = jnp.concatenate(sel_iou)
    stab_all = jnp.concatenate(sel_stab)
    valid_all = jnp.concatenate(sel_valid)
    crop_id_all = jnp.concatenate(sel_crop_id)
    cand_idx_all = jnp.concatenate(sel_cand_idx)
    inv_area_all = jnp.concatenate(sel_inv_area)

    # ---- cross-crop NMS (scores = 1/crop-area; reference :210-220) -------
    res = nms(boxes_all, inv_area_all, amg_cfg.crop_nms_thresh, valid_all)
    P = amg_cfg.max_proposals
    kept, kept_valid = kept_in_score_order(res, P)

    kept_crop = crop_id_all[kept]
    kept_cand = cand_idx_all[kept]
    kept_point = kept_cand // M
    kept_channel = kept_cand % M

    # ---- pass 2: re-decode survivors from their own crop embedding -------
    emb_stack = jnp.stack([c["embedding"] for c in crops])  # [nc, g, g, C]
    pe = dense_pe(p_sam["prompt"], sam_cfg)
    # per-candidate point coords in the crop's 1024 frame
    grids = [
        jnp.asarray(_chunk_points(c["grid"], amg_cfg.points_per_batch)).reshape(-1, 2)
        for c in crops
    ]
    maxg = max(g.shape[0] for g in grids)
    grids_padded = jnp.stack(
        [jnp.pad(g, ((0, maxg - g.shape[0]), (0, 0))) for g in grids]
    )  # [nc, maxg, 2]
    rws = jnp.stack([jnp.asarray(c["rhw"][1], jnp.float32) for c in crops])
    rhs = jnp.stack([jnp.asarray(c["rhw"][0], jnp.float32) for c in crops])
    pts01 = grids_padded[kept_crop, kept_point]  # [P, 2]
    coords = pts01 * jnp.stack([rws[kept_crop], rhs[kept_crop]], axis=-1)

    sparse = embed_points(
        p_sam["prompt"], coords[:, None, :], jnp.ones((P, 1), jnp.float32), sam_cfg
    )
    dense = no_mask_dense(p_sam["prompt"], sam_cfg, P)

    # one batched decode over all P survivors: predict_masks' batched path
    # adds image_embedding[None] + dense_prompts, so the per-candidate crop
    # embedding rides the dense-prompt slot (exact — the add is linear) and
    # the whole re-decode is a single B=P call on the fused kernels instead
    # of a vmap of P one-prompt decodes.
    dense_full = emb_stack[kept_crop] + dense  # [P, g, g, C]
    low_res, _ = predict_masks(
        p_sam["decoder"],
        jnp.zeros_like(emb_stack[0]),
        pe,
        sparse,
        sam_cfg,
        dense_prompts=dense_full,
        multimask_output=True,
    )  # [P, 3, 256, 256]
    sel = jnp.take_along_axis(low_res, kept_channel.reshape(P, 1, 1, 1), axis=1)[:, 0]

    oy = jnp.stack([jnp.asarray(c["origin"][0], jnp.float32) for c in crops])
    ox = jnp.stack([jnp.asarray(c["origin"][1], jnp.float32) for c in crops])
    eh = jnp.stack([jnp.asarray(c["extent"][0], jnp.float32) for c in crops])
    ew = jnp.stack([jnp.asarray(c["extent"][1], jnp.float32) for c in crops])

    def place_one(m, ci):
        # per-candidate crop geometry -> its own composed resize matrices
        return place_two_stage(
            m[None],
            sam_cfg.img_size,
            (rhs[ci], rws[ci]),
            (canonical, canonical),
            (oy[ci], ox[ci]),
            (eh[ci], ew[ci]),
            fill=PAD_NEG,
        )[0]

    logits = jax.vmap(place_one)(sel, kept_crop)
    masks = (logits > sam_cfg.mask_threshold) & kept_valid[:, None, None]

    # points recorded in original-image coords (reference uncrops points)
    points = pts01 * jnp.stack([ew[kept_crop], eh[kept_crop]], axis=-1) + jnp.stack(
        [ox[kept_crop], oy[kept_crop]], axis=-1
    )

    return Proposals(
        masks=masks,
        boxes_xyxy=boxes_all[kept] * kept_valid[:, None],
        iou_preds=iou_all[kept] * kept_valid,
        stability=stab_all[kept] * kept_valid,
        points=points * kept_valid[:, None],
        areas=masks.sum(axis=(-2, -1)).astype(jnp.float32),
        valid=kept_valid,
        num=res.num_kept.astype(jnp.int32).clip(0, P),
        overflow=overflow + jnp.maximum(res.num_kept.astype(jnp.int32) - P, 0),
    )
