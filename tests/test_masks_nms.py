import numpy as np
import pytest

import jax.numpy as jnp

from hybridgl_tpu.kernels.masks import (
    box_iou_matrix,
    box_near_crop_edge,
    mask_to_box,
    stability_score,
)
from hybridgl_tpu.kernels.nms import kept_in_score_order, nms


def np_greedy_nms(boxes, scores, thresh):
    """Numpy restatement of torchvision nms semantics."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            xa1, ya1, xa2, ya2 = boxes[i]
            xb1, yb1, xb2, yb2 = boxes[j]
            iw = max(0.0, min(xa2, xb2) - max(xa1, xb1))
            ih = max(0.0, min(ya2, yb2) - max(ya1, yb1))
            inter = iw * ih
            union = (xa2 - xa1) * (ya2 - ya1) + (xb2 - xb1) * (yb2 - yb1) - inter
            if union > 0 and inter / union > thresh:
                suppressed[j] = True
    return keep


def test_nms_matches_numpy_reference(rng):
    N = 60
    centers = rng.random((N, 2)) * 100
    wh = rng.random((N, 2)) * 30 + 2
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    scores = rng.random(N).astype(np.float32)
    ref_keep = np_greedy_nms(boxes, scores, 0.5)
    res = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
    idx, valid = kept_in_score_order(res, N)
    ours = list(np.asarray(idx)[np.asarray(valid)])
    assert ours == ref_keep


def test_nms_respects_validity(rng):
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    valid = np.array([False, True, True])
    res = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, jnp.asarray(valid))
    idx, v = kept_in_score_order(res, 3)
    kept = list(np.asarray(idx)[np.asarray(v)])
    assert kept == [1, 2]


def test_stability_score():
    logits = np.full((5, 5), -2.0, np.float32)
    logits[1:4, 1:4] = 0.5  # 9 px above -1, below +1
    logits[2, 2] = 2.0  # 1 px above +1
    s = float(stability_score(jnp.asarray(logits), 0.0, 1.0))
    assert abs(s - 1 / 9) < 1e-6


def test_mask_to_box():
    m = np.zeros((2, 8, 8), bool)
    m[0, 2:5, 3:7] = True
    box = np.asarray(mask_to_box(jnp.asarray(m)))
    np.testing.assert_array_equal(box[0], [3, 2, 6, 4])
    np.testing.assert_array_equal(box[1], [0, 0, 0, 0])  # empty


def test_box_iou_matrix():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    iou = np.asarray(box_iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(iou[0], [1.0, 25 / 175, 0.0], atol=1e-6)


def test_box_near_crop_edge():
    boxes = jnp.asarray([[5.0, 50, 60, 70], [100, 100, 200, 200]])
    crop = [0, 0, 300, 300]
    orig = [0, 0, 640, 480]
    out = np.asarray(box_near_crop_edge(boxes, crop, orig))
    # box 0 touches crop's left edge (x=5 within atol=20) and that edge is
    # also the image edge -> NOT flagged; shrink the image so it's not:
    assert out.tolist() == [False, False]
    boxes2 = jnp.asarray([[35.0, 50, 60, 70]])  # within atol of crop x0=30
    out2 = np.asarray(box_near_crop_edge(boxes2, [30, 0, 300, 300], orig))
    assert bool(out2[0]) is True


@pytest.mark.parametrize("unroll", [1, 8, 64])
def test_nms_unroll_variants_match(rng, unroll):
    N = 60
    centers = rng.random((N, 2)) * 100
    wh = rng.random((N, 2)) * 30 + 2
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    scores = rng.random(N).astype(np.float32)
    ref_keep = np_greedy_nms(boxes, scores, 0.5)
    res = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, unroll=unroll)
    idx, valid = kept_in_score_order(res, N)
    assert list(np.asarray(idx)[np.asarray(valid)]) == ref_keep
