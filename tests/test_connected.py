"""Oracle tests: jittable connected-components cleanup vs the cv2-based
host implementation (which is itself oracle-tested against the reference's
full-frame semantics in tests/test_postprocess.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hybridgl_tpu.kernels.connected import (
    cleanup_proposals_jit,
    component_sizes,
    label_components,
    remove_small_regions_jit,
)
from hybridgl_tpu.kernels.resize import valid_mask
from hybridgl_tpu.models.sam.amg import Proposals
from hybridgl_tpu.pipeline.postprocess import (
    postprocess_small_regions,
    remove_small_regions,
)

cv2 = pytest.importorskip("cv2")


def test_label_components_matches_cv2(rng):
    for trial in range(6):
        m = (rng.random((40, 56)) > 0.55)
        ours = np.asarray(label_components(jnp.asarray(m)))
        n, ref = cv2.connectedComponents(m.astype(np.uint8), connectivity=8)
        # same partition: our labels and cv2's must be a bijection on m
        for lab in range(1, n):
            sel = ref == lab
            assert len(np.unique(ours[sel])) == 1, f"trial {trial}: split component"
        assert len(np.unique(ours[m])) == n - 1
        # our label == min flat index of the component
        for lab in np.unique(ours[m]):
            ys, xs = np.nonzero(ours == lab)
            assert lab == (ys * 56 + xs).min()


def test_component_sizes(rng):
    m = (rng.random((30, 30)) > 0.5)
    labels = label_components(jnp.asarray(m))
    sizes = np.asarray(component_sizes(labels))
    ln = np.asarray(labels)
    for lab in np.unique(ln[m]):
        assert (sizes[ln == lab] == (ln == lab).sum()).all()
    assert (sizes[~m] == 0).all()


@pytest.mark.parametrize("mode", ["holes", "islands"])
@pytest.mark.parametrize("thresh", [6, 40, 2000])
def test_remove_small_regions_jit_matches_cv2(rng, mode, thresh):
    H = W = 48
    vm = jnp.ones((H, W), bool)
    cases = []
    for _ in range(4):
        cases.append(rng.random((H, W)) > 0.5)
    big = np.zeros((H, W), bool)
    big[8:40, 8:40] = True
    big[20:23, 20:23] = False  # 9-px hole
    big[2:4, 2:4] = True  # 4-px island
    cases.append(big)
    pocket = np.zeros((H, W), bool)
    pocket[30:48, 5:30] = True
    pocket[40:48, 12:18] = False  # open to the bottom edge
    cases.append(pocket)
    for i, m in enumerate(cases):
        got, changed = remove_small_regions_jit(jnp.asarray(m), vm, thresh, mode)
        want, ch_ref = remove_small_regions(m, thresh, mode)
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=f"case {i}")
        assert bool(changed) == bool(ch_ref)


def test_remove_small_regions_jit_valid_region(rng):
    """Padded-frame semantics: components must match a run on the true
    (h, w) image — padding must not bridge an edge pocket to the global
    background, and padding pixels never become mask."""
    C, h, w = 64, 40, 48
    vm = valid_mask((C, C), (h, w))
    m = np.zeros((C, C), bool)
    m[20:40, 10:40] = True
    m[32:40, 20:26] = False  # pocket open at the true bottom edge (row 39)
    got, changed = remove_small_regions_jit(jnp.asarray(m), vm, 100, "holes")
    want, _ = remove_small_regions(m[:h, :w].copy(), 100, "holes")
    np.testing.assert_array_equal(np.asarray(got)[:h, :w], want)
    assert not np.asarray(got)[h:, :].any() and not np.asarray(got)[:, w:].any()
    assert bool(changed)  # the 48-px pocket is filled, as cv2 does on (h, w)


def _bundle(masks, P, C):
    n = len(masks)
    arr = np.zeros((P, C, C), bool)
    boxes = np.zeros((P, 4), np.float32)
    for i, m in enumerate(masks):
        arr[i] = m
        ys, xs = np.nonzero(m)
        boxes[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
    valid = np.zeros(P, bool)
    valid[:n] = True
    return Proposals(
        masks=jnp.asarray(arr),
        boxes_xyxy=jnp.asarray(boxes),
        iou_preds=jnp.asarray(valid, jnp.float32),
        stability=jnp.asarray(valid, jnp.float32),
        points=jnp.zeros((P, 2), jnp.float32),
        areas=jnp.asarray(arr.sum((-2, -1)), jnp.float32),
        valid=jnp.asarray(valid),
        num=jnp.asarray(n, jnp.int32),
    )


def test_cleanup_proposals_jit_matches_host(rng):
    """Full bundle pass (cleanup + dedup NMS) == host postprocess, incl.
    the in-place invalidation pattern and the changed-mask demotion."""
    C, h, w = 64, 56, 64
    P = 8
    masks = []
    base = np.zeros((C, C), bool)
    base[5:30, 5:30] = True
    noisy = base.copy()
    noisy[40:42, 40:42] = True  # 4-px island -> cleanup makes it == base
    masks.append(base)
    masks.append(noisy)
    holey = np.zeros((C, C), bool)
    holey[30:52, 30:60] = True
    holey[40:43, 40:43] = False
    masks.append(holey)
    for _ in range(2):
        m = np.zeros((C, C), bool)
        m[: h, : w] = rng.random((h, w)) > 0.6
        masks.append(m)

    props = _bundle(masks, P, C)
    vm = valid_mask((C, C), (h, w))
    got = jax.jit(
        lambda p: cleanup_proposals_jit(p, vm, 12, 0.7)
    )(props)
    want = postprocess_small_regions(props, min_area=12, nms_thresh=0.7, hw=(h, w))

    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    np.testing.assert_array_equal(np.asarray(got.masks), np.asarray(want.masks))
    assert int(got.num) == int(want.num)
    np.testing.assert_allclose(
        np.asarray(got.areas), np.asarray(want.areas), atol=0
    )
    # boxes agree on surviving proposals
    v = np.asarray(want.valid)
    np.testing.assert_allclose(
        np.asarray(got.boxes_xyxy)[v], np.asarray(want.boxes_xyxy)[v], atol=0
    )
