import numpy as np
import pytest

import jax.numpy as jnp

from hybridgl_tpu.models.sam.amg import Proposals
from hybridgl_tpu.pipeline.postprocess import (
    postprocess_small_regions,
    remove_small_regions,
)

cv2 = pytest.importorskip("cv2")


def test_remove_small_holes():
    m = np.ones((20, 20), bool)
    m[5:7, 5:7] = False  # 4-px hole
    out, changed = remove_small_regions(m, 10, "holes")
    assert changed and out.all()


def test_remove_small_islands_keeps_large():
    m = np.zeros((30, 30), bool)
    m[:10, :10] = True  # 100 px island
    m[20:22, 20:22] = True  # 4 px island
    out, changed = remove_small_regions(m, 10, "islands")
    assert changed
    assert out[:10, :10].all() and not out[20:22, 20:22].any()


def test_remove_all_small_keeps_largest():
    m = np.zeros((30, 30), bool)
    m[0:2, 0:3] = True  # 6 px
    m[10:12, 10:12] = True  # 4 px
    out, changed = remove_small_regions(m, 100, "islands")
    assert changed
    assert out[0:2, 0:3].all() and not out[10:12, 10:12].any()


def _make_props(masks):
    P = len(masks)
    boxes = np.zeros((P, 4), np.float32)
    for i, m in enumerate(masks):
        ys, xs = np.nonzero(m)
        if len(ys):
            boxes[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
    return Proposals(
        masks=jnp.asarray(np.stack(masks)),
        boxes_xyxy=jnp.asarray(boxes),
        iou_preds=jnp.ones(P, jnp.float32),
        stability=jnp.ones(P, jnp.float32),
        points=jnp.zeros((P, 2), jnp.float32),
        areas=jnp.asarray(np.stack(masks).sum((-2, -1)), jnp.float32),
        valid=jnp.ones(P, bool),
        num=jnp.asarray(P, jnp.int32),
    )


def test_postprocess_dedups_after_cleanup():
    # two masks that become identical once the small blob is removed:
    # the changed one must be suppressed in favour of the unchanged one
    base = np.zeros((40, 40), bool)
    base[5:25, 5:25] = True
    noisy = base.copy()
    noisy[35:37, 35:37] = True  # 4-px extra island
    props = _make_props([base, noisy])
    out = postprocess_small_regions(props, min_area=10, nms_thresh=0.7)
    valid = np.asarray(out.valid)
    assert valid[0] and not valid[1]
    assert int(np.asarray(out.num)) == 1
    np.testing.assert_array_equal(np.asarray(out.masks)[0], base)


def test_postprocess_fills_holes_and_updates_boxes():
    m = np.zeros((40, 40), bool)
    m[10:30, 10:30] = True
    m[15:17, 15:17] = False  # hole
    props = _make_props([m])
    out = postprocess_small_regions(props, min_area=10, nms_thresh=0.7)
    got = np.asarray(out.masks)[0]
    assert got[15, 15]  # hole filled
    assert float(np.asarray(out.areas)[0]) == got.sum()


def test_postprocess_noop_when_disabled():
    m = np.zeros((20, 20), bool)
    m[2:8, 2:8] = True
    props = _make_props([m])
    out = postprocess_small_regions(props, min_area=0, nms_thresh=0.7)
    assert out is props


def test_bbox_tight_mask_not_demoted_at_large_min_area():
    """Regression (advisor, round 1): a bbox-tight solid mask must survive
    the crop-windowed holes pass untouched. The crop's ring-connected
    background (124 px here) is the *global* background, not a hole, even
    when it is smaller than min_area (RefCOCO default 800)."""
    H = W = 200
    m = np.zeros((H, W), bool)
    m[50:70, 50:90] = True  # 20x40 solid rectangle, area 800
    props = _make_props([m])
    out, changed = postprocess_small_regions(
        props, min_area=800, nms_thresh=0.7, return_changed=True
    )
    assert not changed  # nothing modified, nothing suppressed
    np.testing.assert_array_equal(np.asarray(out.masks)[0], m)
    assert bool(np.asarray(out.valid)[0])
    # full-frame reference agrees: the background is one huge component
    full, ch = remove_small_regions(m, 800, "holes")
    assert not ch


def test_full_frame_equivalence_large_min_area():
    """Crop-windowed cleanup == full-frame cleanup in the min_area=800
    regime (the RefCOCO config), incl. edge-touching and holey masks."""
    H = W = 300
    masks = []
    # bbox-tight rectangle (the advisor's repro)
    m = np.zeros((H, W), bool)
    m[10:30, 10:50] = True
    masks.append(m)
    # big mask with a genuinely small interior hole -> must still be filled
    m = np.zeros((H, W), bool)
    m[50:150, 50:150] = True
    m[90:100, 90:100] = False  # 100-px hole < 800
    masks.append(m)
    # full-width stripe touching both side edges (background split above/below)
    m = np.zeros((H, W), bool)
    m[120:180, :] = True
    masks.append(m)
    # mask in the image corner (ring clipped on two sides)
    m = np.zeros((H, W), bool)
    m[0:40, 0:40] = True
    m[10:20, 10:20] = False  # 100-px hole
    masks.append(m)
    # mask with a pocket open to the image edge (not an enclosed hole)
    m = np.zeros((H, W), bool)
    m[250:300, 100:200] = True
    m[280:300, 140:160] = False  # open to the bottom edge, 400 px
    masks.append(m)

    for i, m in enumerate(masks):
        props = _make_props([m])
        out = postprocess_small_regions(props, min_area=800, nms_thresh=0.7)
        full, _ = remove_small_regions(m, 800, "holes")
        full, _ = remove_small_regions(full, 800, "islands")
        np.testing.assert_array_equal(
            np.asarray(out.masks)[0], full, err_msg=f"mask {i}"
        )


def test_bucket_props_covers_non_prefix_valid():
    """Regression (advisor, round 1): after in-place cleanup suppression,
    validity is not a prefix; the bucket slice must still cover the highest
    live index (here 12 with only 8 valid -> old code sliced to 8)."""
    import jax.numpy as jnp
    from hybridgl_tpu.pipeline.runner import HybridGLPipeline

    P = 64
    valid = np.zeros(P, bool)
    valid[:7] = True
    valid[12] = True
    props = Proposals(
        masks=jnp.zeros((P, 8, 8), bool),
        boxes_xyxy=jnp.zeros((P, 4), jnp.float32),
        iou_preds=jnp.zeros(P, jnp.float32),
        stability=jnp.zeros(P, jnp.float32),
        points=jnp.zeros((P, 2), jnp.float32),
        areas=jnp.zeros(P, jnp.float32),
        valid=jnp.asarray(valid),
        num=jnp.asarray(8, jnp.int32),
    )
    pipe = object.__new__(HybridGLPipeline)  # _bucket_props is self-free
    out = pipe._bucket_props(props, 8)
    assert out.masks.shape[0] >= 13
    assert bool(np.asarray(out.valid)[12])
    # all-invalid bundles still bucket sanely
    props0 = props._replace(valid=jnp.zeros(P, bool), num=jnp.asarray(0, jnp.int32))
    out0 = pipe._bucket_props(props0, 0)
    assert out0.masks.shape[0] == 8


def test_bbox_cropped_cleanup_matches_full_frame(rng):
    """The bbox+ring CC optimisation must match full-frame processing."""
    from hybridgl_tpu.pipeline.postprocess import remove_small_regions

    H = W = 80
    masks = []
    # U-shaped mask with a cavity opening downward past the bbox
    m = np.zeros((H, W), bool)
    m[10:40, 10:15] = True
    m[10:40, 35:40] = True
    m[10:15, 10:40] = True
    masks.append(m)
    # mask touching the image edge with an edge-adjacent pocket
    m = np.zeros((H, W), bool)
    m[60:80, 0:30] = True
    m[70:80, 10:14] = False  # pocket open to the bottom edge
    masks.append(m)
    # mask with a true hole + small island
    m = np.zeros((H, W), bool)
    m[20:50, 20:50] = True
    m[30:33, 30:33] = False  # 9px hole
    m[5:7, 5:7] = True  # 4px island
    masks.append(m)
    # random speckle
    m = np.zeros((H, W), bool)
    m[15:65, 15:65] = rng.random((50, 50)) > 0.4
    masks.append(m)

    props = _make_props(masks)
    out = postprocess_small_regions(props, min_area=12, nms_thresh=0.7)

    # reference: full-frame processing per mask + same NMS
    for i, m in enumerate(masks):
        full, _ = remove_small_regions(m, 12, "holes")
        full, _ = remove_small_regions(full, 12, "islands")
        if bool(np.asarray(out.valid)[i]):
            np.testing.assert_array_equal(
                np.asarray(out.masks)[i], full, err_msg=f"mask {i}"
            )


def test_threaded_cleanup_matches_serial(rng, monkeypatch):
    """HYBRIDGL_CLEANUP_THREADS > 1 (the multi-core DP host path,
    VERDICT r3 #5) must produce byte-identical results to the serial
    loop — per-mask crops write disjoint rows, so the ThreadPoolExecutor
    fan-out is a pure scheduling change."""
    H = W = 96
    masks = []
    for _ in range(12):
        m = np.zeros((H, W), bool)
        y, x = rng.integers(5, 40, 2)
        m[y : y + 45, x : x + 45] = rng.random((45, 45)) > 0.35
        masks.append(m)
    props = _make_props(masks)

    monkeypatch.setenv("HYBRIDGL_CLEANUP_THREADS", "1")
    serial = postprocess_small_regions(
        props._replace(masks=np.asarray(props.masks).copy()),
        min_area=20, nms_thresh=0.7,
    )
    monkeypatch.setenv("HYBRIDGL_CLEANUP_THREADS", "4")
    pooled = postprocess_small_regions(
        props._replace(masks=np.asarray(props.masks).copy()),
        min_area=20, nms_thresh=0.7,
    )
    np.testing.assert_array_equal(np.asarray(serial.masks), np.asarray(pooled.masks))
    np.testing.assert_array_equal(np.asarray(serial.valid), np.asarray(pooled.valid))
    np.testing.assert_allclose(
        np.asarray(serial.boxes_xyxy), np.asarray(pooled.boxes_xyxy)
    )
    np.testing.assert_allclose(np.asarray(serial.areas), np.asarray(pooled.areas))
