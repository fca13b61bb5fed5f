"""Small-region mask postprocessing (host boundary step).

Rebuilds the reference's ``postprocess_small_regions``
(reference: automatic_mask_generator.py:323-372 + utils/amg.py:267-291):
for every surviving proposal, fill holes smaller than ``min_area``, drop
islands smaller than ``min_area`` (keeping the largest island if all are
below threshold), then re-run NMS with score 1 for unchanged masks and 0
for changed ones so duplicates created by the cleanup are removed with a
preference for untouched masks.

Connected components are inherently host work (cv2); this runs once per
image on the <= max_proposals kept masks between the proposal jit and the
feature jit — a bounded, prefetch-overlappable host step rather than the
reference's per-candidate host loop.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from ..models.sam.amg import Proposals


def cleanup_threads() -> int:
    """Host threads for the per-mask cleanup loop. Defaults to the CPU
    count: cv2's connectedComponentsWithStats releases the GIL, so on a
    real multi-core v5e host the per-mask crops clean up concurrently
    (VERDICT r3 #5 — the DP in-step io_callback must not serialize dp
    images' cleanup on one core). Override with
    $HYBRIDGL_CLEANUP_THREADS; this box has nproc=1, where the pool
    degenerates to the serial loop."""
    v = os.environ.get("HYBRIDGL_CLEANUP_THREADS")
    if v is not None:
        return max(1, int(v))
    return os.cpu_count() or 1


def remove_small_regions(
    mask: np.ndarray, area_thresh: float, mode: str
) -> Tuple[np.ndarray, bool]:
    """Fill small holes / drop small islands (reference semantics,
    utils/amg.py:267-291). Returns (mask, changed)."""
    import cv2

    assert mode in ("holes", "islands")
    correct_holes = mode == "holes"
    working = (correct_holes ^ mask).astype(np.uint8)
    n_labels, regions, stats, _ = cv2.connectedComponentsWithStats(working, 8)
    sizes = stats[1:, -1]  # row 0 is background
    small = sizes < area_thresh
    if not small.any():
        return mask, False
    # label lookup table instead of np.isin: O(pixels) regardless of how
    # many components there are (noisy masks can have thousands)
    lut = np.zeros(n_labels, bool)
    if correct_holes:
        lut[0] = True  # background of the inverted frame == the mask itself
        lut[1:] = small
    else:
        lut[1:] = ~small
        if not lut.any():  # keep the largest island if everything is small
            lut[int(np.argmax(sizes)) + 1] = True
    return lut[regions], True


def _remove_small_holes_crop(
    mask: np.ndarray, area_thresh: float, ring_sides: Tuple[bool, bool, bool, bool]
) -> Tuple[np.ndarray, bool]:
    """Holes pass on a bbox+1px-ring crop window.

    A background component connected to the ring is the *global* background
    seen through the window, not a hole: the reference's full-frame pass
    (reference: utils/amg.py:267-291) can never fill it because in the full
    frame it is the unbounded outside region. It must therefore be protected
    here regardless of its (possibly tiny) in-crop size — e.g. a bbox-tight
    40x20 solid mask leaves only a 124-px ring of background, which a naive
    size test would misclassify as a fillable hole when min_area is 800.

    ``ring_sides`` = (top, bottom, left, right): True where the crop border
    is the added ring. A side without a ring coincides with the image
    border, where the full-frame pass sees exactly the same component (any
    border component there that extended sideways past the bbox would touch
    a ring column and be protected through it).
    """
    import cv2

    working = (~mask).astype(np.uint8)
    n_labels, regions, stats, _ = cv2.connectedComponentsWithStats(working, 8)
    sizes = stats[1:, -1]
    small = sizes < area_thresh
    if not small.any():
        return mask, False
    protected = np.zeros(n_labels, bool)
    top, bottom, left, right = ring_sides
    if top:
        protected[np.unique(regions[0])] = True
    if bottom:
        protected[np.unique(regions[-1])] = True
    if left:
        protected[np.unique(regions[:, 0])] = True
    if right:
        protected[np.unique(regions[:, -1])] = True
    fill = small & ~protected[1:]
    if not fill.any():
        return mask, False
    lut = np.zeros(n_labels, bool)
    lut[0] = True  # label 0 = the mask pixels themselves
    lut[1:] = fill
    return lut[regions], True


def _np_box(mask: np.ndarray) -> np.ndarray:
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return np.zeros(4, np.float32)
    return np.array([xs.min(), ys.min(), xs.max(), ys.max()], np.float32)


def _np_nms(boxes: np.ndarray, scores: np.ndarray, thresh: float):
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(boxes), bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            lt = np.maximum(boxes[i, :2], boxes[j, :2])
            rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            aj = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            union = ai + aj - inter
            if union > 0 and inter / union > thresh:
                suppressed[j] = True
    return keep


def postprocess_small_regions(
    props: Proposals,
    min_area: int,
    nms_thresh: float,
    return_changed: bool = False,
    hw=None,
    inplace_masks: bool = False,
) -> Proposals:
    """Host pass over a numpy-materialised Proposals bundle. Suppressed
    duplicates are invalidated in place (static shapes preserved); kept
    masks/boxes are updated where the cleanup changed them.

    ``hw`` is the image's true (h, w) extent when the masks live in a
    zero-padded canonical frame: the reference runs cv2 on the (h, w)
    image, where a background pocket open at the image edge is its own
    component judged by size — the frame padding must not bridge it to the
    global background. Defaults to the full frame.

    With ``return_changed`` returns (props, changed); ``changed`` False
    means no mask was modified and no proposal suppressed — callers can
    keep their original (e.g. device-resident) bundle and skip re-upload.
    """
    masks = np.asarray(props.masks)
    boxes = np.asarray(props.boxes_xyxy).copy()
    valid = np.asarray(props.valid).copy()
    n = int(np.asarray(props.num))
    if n == 0 or min_area <= 0:
        return (props, False) if return_changed else props

    # the full-frame copy is ~26 MB; callers that own the buffer (the
    # runner unpacks a fresh one per image) skip it via inplace_masks
    new_masks = masks if inplace_masks else masks.copy()
    changed_flags = np.zeros(len(masks), bool)
    new_boxes = {}
    new_areas = {}
    H, W = masks.shape[-2:]
    if hw is not None:
        H, W = int(hw[0]), int(hw[1])  # crops clip to the true image extent

    # Native fast path: one C call does both union-find labelings per mask
    # in place on the strided crop windows (native/region_cleanup.cpp);
    # ~4x the cv2 path on this single-core host. Same crop-window + ring
    # semantics; oracle-diffed in tests/test_postprocess_native.py.
    process = valid & (np.arange(len(masks)) < n)
    from . import postprocess_native

    nat = postprocess_native.cleanup_batch(
        new_masks, boxes, process, (H, W), min_area
    )
    if nat is not None:
        changed_flags, nat_boxes, nat_areas = nat
        for i in np.nonzero(changed_flags)[0]:
            new_boxes[i] = nat_boxes[i]
            new_areas[i] = nat_areas[i]
    else:

        def _clean_one(i):
            # Connected components only need the mask's bounding box plus a
            # 1-px background ring: every enclosed background region (hole)
            # lies inside the bbox, every island is a mask pixel (inside the
            # bbox by definition), and any background region touching the bbox
            # edge connects to the ring exactly like it connects to the global
            # background. Identical classification, ~10x fewer pixels.
            bx0, by0, bx1, by1 = (int(v) for v in boxes[i])
            y0 = max(by0 - 1, 0)
            x0 = max(bx0 - 1, 0)
            y1 = min(by1 + 2, H)
            x1 = min(bx1 + 2, W)
            ring = (by0 >= 1, by1 + 2 <= H, bx0 >= 1, bx1 + 2 <= W)
            crop = masks[i, y0:y1, x0:x1]
            c2, ch1 = _remove_small_holes_crop(crop, min_area, ring)
            c2, ch2 = remove_small_regions(c2, min_area, "islands")
            changed = ch1 or ch2
            if changed:
                # rows are disjoint across i: in-place writes are
                # thread-safe under the pool below
                new_masks[i, y0:y1, x0:x1] = c2
                # the cleaned mask lives inside the crop, so its box does too
                cb = _np_box(c2)
                new_boxes[i] = cb + np.array([x0, y0, x0, y0], np.float32)
            changed_flags[i] = changed

        live = [i for i in range(n) if valid[i]]
        n_threads = min(cleanup_threads(), len(live))
        if n_threads > 1:
            # cv2 releases the GIL inside connectedComponentsWithStats, so
            # the per-mask crops clean concurrently on multi-core hosts
            # (new_boxes dict writes are GIL-serialized; mask rows disjoint)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=n_threads) as pool:
                list(pool.map(_clean_one, live))
        else:
            for i in live:
                _clean_one(i)

    idx = [i for i in range(n) if valid[i]]
    nms_boxes = np.stack(
        [new_boxes[i] if changed_flags[i] else boxes[i] for i in idx]
    )
    scores = np.array([0.0 if changed_flags[i] else 1.0 for i in idx], np.float32)
    keep = _np_nms(nms_boxes, scores, nms_thresh)
    keep_set = {idx[k] for k in keep}
    mutated = bool(changed_flags.any()) or len(keep_set) < len(idx)
    if not mutated:
        return (props, False) if return_changed else props
    for pos, i in enumerate(idx):
        if i not in keep_set:
            valid[i] = False
            new_masks[i] = False
        elif changed_flags[i]:
            boxes[i] = nms_boxes[pos]

    if nat is not None:
        # incremental areas (skip a full [P, H, W] reduction): unchanged
        # masks keep their AMG-computed pixel count, changed ones take the
        # count from the native pass, suppressed ones drop to zero
        areas = np.asarray(props.areas, np.float32).copy()
        for i, a in new_areas.items():
            areas[i] = a
    else:
        areas = new_masks.sum(axis=(-2, -1)).astype(np.float32)
    # both paths zero invalid/suppressed rows so the two backends produce
    # identical Proposals.areas (initially-invalid rows may carry junk masks)
    areas[~valid] = 0.0
    if return_changed:
        return _rebuild(props, new_masks, boxes, valid, areas), True
    return _rebuild(props, new_masks, boxes, valid, areas)


def _rebuild(props, new_masks, boxes, valid, areas):
    return Proposals(
        masks=new_masks,
        boxes_xyxy=boxes * valid[:, None],
        iou_preds=np.asarray(props.iou_preds) * valid,
        stability=np.asarray(props.stability) * valid,
        points=np.asarray(props.points) * valid[:, None],
        areas=areas,
        valid=valid,
        num=np.asarray(valid.sum(), np.int32),
        overflow=props.overflow,
    )
