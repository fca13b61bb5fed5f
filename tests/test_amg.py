import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from hybridgl_tpu.core.config import AmgConfig
from hybridgl_tpu.core.convert import convert_sam
from hybridgl_tpu.models.sam.amg import Proposals, build_point_grid, generate_proposals

from test_masks_nms import np_greedy_nms
from torch_ref_sam import make_tiny_sam


@pytest.fixture(scope="module")
def tiny():
    model, cfg = make_tiny_sam()
    params = convert_sam(model.state_dict_upstream(), cfg)
    return model, cfg, params


AMG = AmgConfig(
    points_per_side=4,
    points_per_batch=8,
    pred_iou_thresh=0.0,  # random weights -> keep filters permissive
    stability_score_thresh=0.0,
    box_nms_thresh=0.7,
    min_mask_region_area=0,
    max_proposals=16,
)


def torch_amg_oracle(model, cfg, image_u8, h, w, rh, rw, canonical):
    """Reference AMG flow restated with the tiny torch SAM + numpy."""
    with torch.no_grad():
        mean = torch.tensor(cfg.pixel_mean).view(-1, 1, 1)
        std = torch.tensor(cfg.pixel_std).view(-1, 1, 1)
        x = (torch.from_numpy(image_u8).float().permute(2, 0, 1) - mean) / std
        # zero out padding (image already lives in the padded frame)
        x[:, rh:, :] = 0
        x[:, :, rw:] = 0
        emb = model.image_encoder(x[None])[0]

        grid = build_point_grid(4)
        coords = torch.from_numpy(grid * np.array([[w, h]], np.float32))
        coords_in = coords * torch.tensor([rw / w, rh / h])
        labels = torch.ones(len(grid), 1)
        sparse = model.prompt_encoder.embed_points(coords_in[:, None, :], labels)
        dense = (
            model.prompt_encoder.no_mask_embed.weight[0]
            .reshape(1, -1, 1, 1)
            .expand(len(grid), -1, cfg.embed_grid, cfg.embed_grid)
        )
        masks, iou = model.mask_decoder(
            emb, model.prompt_encoder.dense_pe(), sparse, dense
        )
        masks = masks.flatten(0, 1)  # [N*3, 16, 16]
        iou = iou.flatten(0, 1)
        up = F.interpolate(masks[:, None], (cfg.img_size, cfg.img_size), mode="bilinear", align_corners=False)
        up = up[:, :, :rh, :rw]
        logits = F.interpolate(up, (h, w), mode="bilinear", align_corners=False)[:, 0]

    logits = logits.numpy()
    iou = iou.numpy()
    hi = (logits > 1.0).sum((-2, -1))
    lo = (logits > -1.0).sum((-2, -1))
    stab = hi / np.maximum(lo, 1)
    binm = logits > 0.0
    boxes = np.zeros((len(binm), 4), np.float32)
    for i, m in enumerate(binm):
        ys, xs = np.where(m)
        if len(ys):
            boxes[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
    valid = binm.any((-2, -1))
    if AMG.stability_score_thresh > 0:
        valid &= stab >= AMG.stability_score_thresh
    idx = np.where(valid)[0]
    keep = np_greedy_nms(boxes[idx], iou[idx], AMG.box_nms_thresh)
    kept = idx[keep]
    return binm[kept], boxes[kept], iou[kept], stab[kept]


@pytest.mark.slow
def test_amg_matches_reference_flow(tiny):
    model, cfg, params = tiny
    rng = np.random.default_rng(3)
    h, w = 24, 32  # original size; long-side resize x2 -> rh=48, rw=64
    rh, rw = 48, 64
    canonical = 32
    img = np.zeros((cfg.img_size, cfg.img_size, 3), np.uint8)
    img[:rh, :rw] = rng.integers(0, 255, (rh, rw, 3), np.uint8)

    fn = jax.jit(
        lambda p, im: generate_proposals(
            p, im, rh, rw, h, w, cfg, AMG, canonical
        )
    )
    out: Proposals = fn(params, jnp.asarray(img))
    n = int(out.num)

    ref_masks, ref_boxes, ref_iou, ref_stab = torch_amg_oracle(
        model, cfg, img, h, w, rh, rw, canonical
    )

    assert n == len(ref_masks)
    np.testing.assert_allclose(
        np.asarray(out.iou_preds)[:n], ref_iou, atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.stability)[:n], ref_stab, atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(np.asarray(out.boxes_xyxy)[:n], ref_boxes, atol=0)
    ours_masks = np.asarray(out.masks)[:n, :h, :w]
    mismatch = (ours_masks != ref_masks).mean()
    assert mismatch < 1e-3  # bilinear boundary pixels may flip
    # padded entries are inert
    assert not np.asarray(out.masks)[n:].any()
    assert not np.asarray(out.valid)[n:].any()


def test_point_grid_matches_reference_semantics():
    g = build_point_grid(2)
    np.testing.assert_allclose(
        g, [[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]]
    )
