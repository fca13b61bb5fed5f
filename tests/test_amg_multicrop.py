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
    generate_proposals_multicrop,
)

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
