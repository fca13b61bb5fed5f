import math
from itertools import product

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hybridgl_tpu.core.config import AmgConfig
from hybridgl_tpu.core.convert import convert_sam
from hybridgl_tpu.models.sam.amg import (
    _crop_boxes_layer1,
    build_point_grid,
    generate_proposals_multicrop,
)

from test_masks_nms import np_greedy_nms
from torch_ref_sam import make_tiny_sam


def np_generate_crop_boxes(im_size, n_layers, overlap_ratio):
    """Numpy restatement of the reference crop-box math (utils/amg.py:200-234)."""
    crop_boxes = [[0, 0, im_size[1], im_size[0]]]
    im_h, im_w = im_size
    short_side = min(im_h, im_w)

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_crops_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_crops_per_side))
        crop_w = crop_len(im_w, n_crops_per_side, overlap)
        crop_h = crop_len(im_h, n_crops_per_side, overlap)
        x0s = [int((crop_w - overlap) * i) for i in range(n_crops_per_side)]
        y0s = [int((crop_h - overlap) * i) for i in range(n_crops_per_side)]
        for x0, y0 in product(x0s, y0s):
            crop_boxes.append([x0, y0, min(x0 + crop_w, im_w), min(y0 + crop_h, im_h)])
    return crop_boxes


@pytest.mark.parametrize("hw", [(480, 640), (640, 427), (333, 500), (64, 64)])
def test_crop_boxes_match_reference(hw):
    h, w = hw
    ratio = 512 / 1500
    ref = np_generate_crop_boxes((h, w), 1, ratio)[1:]  # layer-1 boxes
    ours = _crop_boxes_layer1(h, w, ratio)
    assert len(ours) == 4
    for (y0, x0, ch, cw), (rx0, ry0, rx1, ry1) in zip(ours, ref):
        assert float(x0) == rx0
        assert float(y0) == ry0
        assert float(x0 + cw) == rx1
        assert float(y0 + ch) == ry1


@pytest.fixture(scope="module")
def tiny():
    model, cfg = make_tiny_sam()
    params = convert_sam(model.state_dict_upstream(), cfg)
    return cfg, params


AMG_MC = AmgConfig(
    points_per_side=4,
    points_per_batch=8,
    pred_iou_thresh=0.0,
    stability_score_thresh=0.0,
    crop_n_layers=1,
    crop_n_points_downscale_factor=2,
    min_mask_region_area=0,
    max_proposals=16,
    max_candidates_per_crop=16,
)


@pytest.mark.slow
def test_multicrop_amg_runs_and_is_sane(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(5)
    canonical = 32
    h, w = 24, 32
    rh, rw = 48, 64
    img1024 = np.zeros((cfg.img_size, cfg.img_size, 3), np.uint8)
    img1024[:rh, :rw] = rng.integers(0, 255, (rh, rw, 3), np.uint8)
    imgc = np.zeros((canonical, canonical, 3), np.uint8)
    imgc[:h, :w] = rng.integers(0, 255, (h, w, 3), np.uint8)

    fn = jax.jit(
        lambda p, a, b: generate_proposals_multicrop(
            p, a, rh, rw, b, h, w, cfg, AMG_MC, canonical
        )
    )
    out = fn(params, jnp.asarray(img1024), jnp.asarray(imgc))
    n = int(out.num)
    assert 0 < n <= AMG_MC.max_proposals
    masks = np.asarray(out.masks)
    valid = np.asarray(out.valid)
    assert valid[:n].all() and not valid[n:].any()
    # no mask pixels outside the image's valid region
    assert not masks[:, h:, :].any()
    assert not masks[:, :, w:].any()
    # boxes consistent with masks for valid proposals
    boxes = np.asarray(out.boxes_xyxy)
    for i in range(n):
        ys, xs = np.nonzero(masks[i])
        if len(ys) == 0:
            continue
        np.testing.assert_allclose(
            boxes[i], [xs.min(), ys.min(), xs.max(), ys.max()], atol=0
        )
    # padded entries inert
    assert not masks[n:].any()


def test_multicrop_prefers_small_crops_on_duplicates(tiny):
    # cross-crop NMS scores are 1/crop-area: if a layer-1 crop produces a
    # near-duplicate of a full-image mask, the crop's wins. Hard to force
    # with random weights; instead check the scoring mechanics directly.
    from hybridgl_tpu.kernels.nms import kept_in_score_order, nms

    boxes = jnp.asarray(
        [[0.0, 0, 10, 10], [0.1, 0, 10, 10], [50, 50, 60, 60]], jnp.float32
    )
    inv_area = jnp.asarray([1e-4, 1e-2, 1e-2], jnp.float32)  # crop beats full
    res = nms(boxes, inv_area, 0.7)
    idx, v = kept_in_score_order(res, 3)
    kept = list(np.asarray(idx)[np.asarray(v)])
    assert 1 in kept and 0 not in kept


# ---------------------------------------------------------------------------
# end-to-end diff vs a torch restatement of the reference multi-crop flow
# (automatic_mask_generator.py:197-264: per-crop scoring -> crop-edge filter
# -> per-crop NMS (iou scores) -> cross-crop NMS (1/crop-area scores))
# ---------------------------------------------------------------------------


def _torch_resize(img_f32_hwc, out_hw):
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(img_f32_hwc).permute(2, 0, 1)[None]
    out = F.interpolate(t, out_hw, mode="bilinear", align_corners=False)
    return out[0].permute(1, 2, 0).numpy()


def _torch_crop_candidates(model, cfg, crop_img_f32, ch, cw, crh, crw, grid01,
                           crop_box, img_box):
    """Score every (point, channel) candidate of one crop; returns numpy
    (iou, stab, boxes_canonical, valid, masks_crop) with boxes in original
    image coords."""
    import torch
    import torch.nn.functional as F

    S = cfg.img_size
    resized = _torch_resize(crop_img_f32, (crh, crw))
    frame = np.zeros((S, S, 3), np.float32)
    frame[:crh, :crw] = resized
    mean = np.array(cfg.pixel_mean, np.float32)
    std = np.array(cfg.pixel_std, np.float32)
    x = (frame - mean) / std
    x[crh:] = 0
    x[:, crw:] = 0
    with torch.no_grad():
        emb = model.image_encoder(
            torch.from_numpy(x).permute(2, 0, 1)[None]
        )[0]
        coords = torch.from_numpy(grid01 * np.array([[crw, crh]], np.float32))
        labels = torch.ones(len(grid01), 1)
        sparse = model.prompt_encoder.embed_points(coords[:, None, :], labels)
        dense = (
            model.prompt_encoder.no_mask_embed.weight[0]
            .reshape(1, -1, 1, 1)
            .expand(len(grid01), -1, cfg.embed_grid, cfg.embed_grid)
        )
        masks, iou = model.mask_decoder(
            emb, model.prompt_encoder.dense_pe(), sparse, dense
        )
        masks = masks.flatten(0, 1)
        iou = iou.flatten(0, 1).numpy()
        up = F.interpolate(masks[:, None], (S, S), mode="bilinear", align_corners=False)
        up = up[:, :, :crh, :crw]
        logits = F.interpolate(up, (ch, cw), mode="bilinear", align_corners=False)[
            :, 0
        ].numpy()

    hi = (logits > 1.0).sum((-2, -1))
    lo = (logits > -1.0).sum((-2, -1))
    stab = hi / np.maximum(lo, 1)
    binm = logits > 0.0
    cx0, cy0 = crop_box[0], crop_box[1]
    boxes = np.zeros((len(binm), 4), np.float32)
    for i, m in enumerate(binm):
        ys, xs = np.where(m)
        if len(ys):
            boxes[i] = [xs.min() + cx0, ys.min() + cy0, xs.max() + cx0, ys.max() + cy0]
    valid = binm.any((-2, -1))
    # near-crop-edge-but-not-near-image-edge filter (utils/amg.py:78-88)
    cb = np.asarray(crop_box, np.float32)
    ib = np.asarray(img_box, np.float32)
    near_crop = np.abs(boxes - cb[None]) <= 20.0
    near_img = np.abs(boxes - ib[None]) <= 20.0
    valid &= ~np.any(near_crop & ~near_img, axis=-1)
    return iou, stab, boxes, valid, binm


@pytest.mark.slow
def test_multicrop_amg_matches_reference_flow(tiny):
    import torch
    from torch_ref_sam import make_tiny_sam

    model, cfg_m = make_tiny_sam()
    cfg, params = tiny
    assert cfg_m.img_size == cfg.img_size

    rng = np.random.default_rng(11)
    h, w = 24, 32
    rh, rw = 48, 64
    canonical = 32
    S = cfg.img_size
    imgc = np.zeros((canonical, canonical, 3), np.uint8)
    imgc[:h, :w] = rng.integers(0, 255, (h, w, 3), np.uint8)
    # consistent long-side-resized full frame (scale exactly 2)
    img1024 = np.zeros((S, S, 3), np.float32)
    img1024[:rh, :rw] = _torch_resize(imgc[:h, :w].astype(np.float32), (rh, rw))

    fn = jax.jit(
        lambda p, a, b: generate_proposals_multicrop(
            p, a, rh, rw, b, h, w, cfg, AMG_MC, canonical
        )
    )
    out = fn(params, jnp.asarray(img1024), jnp.asarray(imgc))
    n = int(out.num)

    # ---- oracle ----
    img_box = [0, 0, w, h]
    crop_boxes = [img_box] + np_generate_crop_boxes((h, w), 1, AMG_MC.crop_overlap_ratio)[1:]
    grids = [build_point_grid(AMG_MC.points_per_side)] + [
        build_point_grid(AMG_MC.points_per_side // AMG_MC.crop_n_points_downscale_factor)
    ] * 4
    all_boxes, all_iou, all_stab, all_inv_area, all_masks = [], [], [], [], []
    for cb, grid in zip(crop_boxes, grids):
        x0, y0, x1, y1 = cb
        ch, cw = y1 - y0, x1 - x0
        scale = S / max(ch, cw)
        crh, crw = int(ch * scale + 0.5), int(cw * scale + 0.5)
        crop_img = imgc[y0:y1, x0:x1].astype(np.float32)
        iou, stab, boxes, valid, binm = _torch_crop_candidates(
            model, cfg_m, crop_img, ch, cw, crh, crw, grid, cb, img_box
        )
        idx = np.where(valid)[0]
        keep = np_greedy_nms(boxes[idx], iou[idx], AMG_MC.box_nms_thresh)
        kept = idx[keep]
        # uncrop kept masks into the canonical frame
        for i in kept:
            m = np.zeros((canonical, canonical), bool)
            m[y0 : y0 + ch, x0 : x0 + cw] = binm[i]
            all_masks.append(m)
        all_boxes.append(boxes[kept])
        all_iou.append(iou[kept])
        all_stab.append(stab[kept])
        all_inv_area.append(np.full(len(kept), 1.0 / (ch * cw), np.float32))
    boxes_all = np.concatenate(all_boxes)
    iou_all = np.concatenate(all_iou)
    stab_all = np.concatenate(all_stab)
    inv_all = np.concatenate(all_inv_area)
    keep2 = np_greedy_nms(boxes_all, inv_all, AMG_MC.crop_nms_thresh)

    assert n == len(keep2)
    np.testing.assert_allclose(
        np.asarray(out.iou_preds)[:n], iou_all[keep2], atol=5e-3, rtol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.stability)[:n], stab_all[keep2], atol=2e-2, rtol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(out.boxes_xyxy)[:n], boxes_all[keep2], atol=1.0
    )
    ours_masks = np.asarray(out.masks)[:n]
    for i, j in enumerate(keep2):
        om, rm = ours_masks[i], all_masks[j]
        inter = (om & rm).sum()
        union = (om | rm).sum()
        assert union > 0 and inter / union > 0.95, (i, inter / union)


@pytest.mark.slow
def test_multicrop_overflow_counter(tiny):
    """A too-small max_candidates_per_crop must be SURFACED, not silent
    (the reference keeps every NMS survivor; our static bucket can't)."""
    import dataclasses

    cfg, params = tiny
    rng = np.random.default_rng(6)
    canonical = 32
    h, w = 24, 32
    rh, rw = 48, 64
    img1024 = np.zeros((cfg.img_size, cfg.img_size, 3), np.uint8)
    img1024[:rh, :rw] = rng.integers(0, 255, (rh, rw, 3), np.uint8)
    imgc = np.zeros((canonical, canonical, 3), np.uint8)
    imgc[:h, :w] = rng.integers(0, 255, (h, w, 3), np.uint8)

    amg_tight = dataclasses.replace(
        AMG_MC, max_candidates_per_crop=2, max_proposals=8,
        box_nms_thresh=0.99,  # suppress almost nothing -> survivors > bucket
    )
    fn = jax.jit(
        lambda p, a, b: generate_proposals_multicrop(
            p, a, rh, rw, b, h, w, cfg, amg_tight, canonical
        )
    )
    out = fn(params, jnp.asarray(img1024), jnp.asarray(imgc))
    # thresholds are 0, so every grid point survives filtering; with K=2 the
    # per-crop NMS must have dropped survivors and said so
    assert int(out.overflow) > 0
    # roomy buckets on the same image report less (usually zero) loss
    amg_roomy = dataclasses.replace(amg_tight, max_candidates_per_crop=16, max_proposals=16)
    fn2 = jax.jit(
        lambda p, a, b: generate_proposals_multicrop(
            p, a, rh, rw, b, h, w, cfg, amg_roomy, canonical
        )
    )
    out2 = fn2(params, jnp.asarray(img1024), jnp.asarray(imgc))
    assert int(out2.overflow) < int(out.overflow)
