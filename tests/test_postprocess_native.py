"""Oracle test: native region cleanup == the cv2/numpy host path.

The native batch pass (native/region_cleanup.cpp via
pipeline/postprocess_native.py) must reproduce the python implementation
byte-for-byte on the full postprocess_small_regions contract — masks,
boxes, validity, areas, changed flag — across structured and adversarial
random inputs (reference semantics: automatic_mask_generator.py:323-372 +
utils/amg.py:267-291)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")  # the oracle leg IS the cv2 path

from hybridgl_tpu.models.sam.amg import Proposals
from hybridgl_tpu.pipeline import postprocess_native
from hybridgl_tpu.pipeline.postprocess import (
    postprocess_small_regions,
    remove_small_regions,
)


def _has_allsmall_tie(mask: np.ndarray, min_area: int) -> bool:
    """True when the islands pass would hit the all-small fallback with a
    TIED max size. cv2's component label order is implementation-defined
    (BBDT renumbering), so np.argmax's tie winner differs from the native
    union-find's raster-first rule — the reference itself inherits cv2's
    arbitrary choice here, so the oracle only compares tie-free inputs
    (see test_allsmall_tie_native_rule for the pinned native behavior)."""
    filled, _ = remove_small_regions(mask.copy(), min_area, "holes")
    n, _, stats, _ = cv2.connectedComponentsWithStats(filled.astype(np.uint8), 8)
    sizes = stats[1:, -1]
    if len(sizes) == 0 or (sizes >= min_area).any():
        return False
    return (sizes == sizes.max()).sum() > 1

def _native_available():
    import os

    os.environ["HYBRIDGL_FORCE_NATIVE_CLEANUP"] = "1"
    try:
        postprocess_native._lib = None
        postprocess_native._tried = False
        return postprocess_native.get_lib() is not None
    finally:
        del os.environ["HYBRIDGL_FORCE_NATIVE_CLEANUP"]
        postprocess_native._lib = None
        postprocess_native._tried = False


pytestmark = pytest.mark.skipif(
    not _native_available(), reason="native cleanup lib unavailable"
)


def _bundle(mask_list, P, C):
    n = len(mask_list)
    arr = np.zeros((P, C, C), bool)
    boxes = np.zeros((P, 4), np.float32)
    for i, m in enumerate(mask_list):
        arr[i] = m
        ys, xs = np.nonzero(m)
        if len(ys):
            boxes[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
    valid = np.zeros(P, bool)
    valid[:n] = True
    return Proposals(
        masks=arr,
        boxes_xyxy=boxes,
        iou_preds=valid.astype(np.float32),
        stability=valid.astype(np.float32),
        points=np.zeros((P, 2), np.float32),
        areas=arr.sum((-2, -1)).astype(np.float32),
        valid=valid,
        num=np.asarray(n, np.int32),
    )


def _run_both(props, min_area, nms_thresh, hw, monkeypatch):
    monkeypatch.setenv("HYBRIDGL_FORCE_NATIVE_CLEANUP", "1")
    monkeypatch.setattr(postprocess_native, "_lib", None)
    monkeypatch.setattr(postprocess_native, "_tried", False)
    got = postprocess_small_regions(props, min_area, nms_thresh, hw=hw)
    monkeypatch.setenv("HYBRIDGL_NO_NATIVE_CLEANUP", "1")
    monkeypatch.setattr(postprocess_native, "_lib", None)
    monkeypatch.setattr(postprocess_native, "_tried", False)
    want = postprocess_small_regions(props, min_area, nms_thresh, hw=hw)
    monkeypatch.delenv("HYBRIDGL_NO_NATIVE_CLEANUP")
    monkeypatch.setattr(postprocess_native, "_lib", None)
    monkeypatch.setattr(postprocess_native, "_tried", False)
    return got, want


def _assert_equal(got, want):
    np.testing.assert_array_equal(np.asarray(got.masks), np.asarray(want.masks))
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    np.testing.assert_allclose(
        np.asarray(got.boxes_xyxy), np.asarray(want.boxes_xyxy), atol=0
    )
    np.testing.assert_allclose(np.asarray(got.areas), np.asarray(want.areas), atol=0)
    assert int(got.num) == int(want.num)


def test_structured_masks(monkeypatch, rng):
    C, h, w = 96, 80, 96
    masks = []
    base = np.zeros((C, C), bool)
    base[5:40, 5:40] = True
    masks.append(base)
    noisy = base.copy()
    noisy[60:62, 60:62] = True  # small island
    masks.append(noisy)
    holey = np.zeros((C, C), bool)
    holey[30:78, 30:90] = True
    holey[40:43, 40:43] = False  # small hole
    masks.append(holey)
    tight = np.zeros((C, C), bool)
    tight[:30, :40] = True  # bbox-tight at the image corner (ring case)
    masks.append(tight)
    tiny = np.zeros((C, C), bool)
    tiny[50:52, 10:12] = True  # all-small fallback
    tiny[54:55, 10:11] = True
    masks.append(tiny)
    props = _bundle(masks, 8, C)
    got, want = _run_both(props, 12, 0.7, (h, w), monkeypatch)
    _assert_equal(got, want)


@pytest.mark.parametrize("min_area", [5, 50, 800])
def test_random_masks(monkeypatch, min_area):
    rng = np.random.default_rng(min_area)
    C, h, w = 128, 100, 120
    masks = []
    for d in (0.3, 0.5, 0.7):
        while True:
            m = np.zeros((C, C), bool)
            m[:h, :w] = rng.random((h, w)) > d
            if not _has_allsmall_tie(m, min_area):
                break
        masks.append(m)
    # blobby masks (closer to real proposals)
    added = 0
    while added < 3:
        m = np.zeros((C, C), bool)
        y, x = rng.integers(0, h - 30), rng.integers(0, w - 30)
        m[y : y + 30, x : x + 30] = rng.random((30, 30)) > 0.2
        if _has_allsmall_tie(m, min_area):
            continue
        masks.append(m)
        added += 1
    props = _bundle(masks, 8, C)
    got, want = _run_both(props, min_area, 0.7, (h, w), monkeypatch)
    _assert_equal(got, want)


def test_allsmall_tie_native_rule(monkeypatch):
    """When every island is small and the max size ties, the native pass
    deterministically keeps the raster-FIRST tied component (smallest
    union-find root). cv2's winner is implementation-defined, so this is
    pinned as native-only behavior rather than oracle-diffed."""
    C = 64
    m = np.zeros((C, C), bool)
    m[10:12, 10:12] = True  # 4 px, first in raster order
    m[40:42, 40:42] = True  # 4 px tie
    props = _bundle([m], 4, C)
    monkeypatch.setenv("HYBRIDGL_FORCE_NATIVE_CLEANUP", "1")
    monkeypatch.setattr(postprocess_native, "_lib", None)
    monkeypatch.setattr(postprocess_native, "_tried", False)
    out = postprocess_small_regions(props, 5, 0.7, hw=(C, C))
    monkeypatch.setattr(postprocess_native, "_lib", None)
    monkeypatch.setattr(postprocess_native, "_tried", False)
    got = np.asarray(out.masks[0])
    assert got[10:12, 10:12].all() and not got[40:42, 40:42].any()


def test_no_change_short_circuit(monkeypatch):
    C = 64
    solid = np.zeros((C, C), bool)
    solid[10:50, 10:50] = True
    props = _bundle([solid], 4, C)
    got, ch = postprocess_small_regions(props, 12, 0.7, hw=(C, C), return_changed=True)
    assert ch is False
    assert got is props
