#!/usr/bin/env python
"""Measure the DP in-step host-cleanup wall: 1 image vs an 8-image step.

VERDICT r3 #5: under data parallelism the in-step small-region cleanup
(`parallel/full_eval.py:_host_cleanup_in_step`) io_callbacks dp images'
cleanup to the host; if those serialize on one core, DP scaling flattens.
This probe isolates exactly that host work — `postprocess_small_regions`
over representative [P, 640, 640] bundles — and reports:

  serial    : 8 bundles one after another, threads=1 (the worst case the
              verdict describes)
  pooled    : 8 bundles one after another, per-mask ThreadPoolExecutor
              (HYBRIDGL_CLEANUP_THREADS=cpu_count; what a real multi-core
              v5e host runs)
  overlapped: 8 bundles submitted concurrently from 8 threads (what
              unordered io_callbacks allow once cv2 drops the GIL)

On THIS box nproc=1, so no configuration can beat ~8x the 1-image wall —
the probe exists to record the per-image wall and to validate the pooled
paths produce identical results; on a real v5e host (>=112 cores) the
pooled/overlapped walls are the ones that matter.

Usage: python tools/probe_dp_cleanup.py [n_images] [P]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def make_bundle(rng, P=64, C=640, hw=(480, 640), n_live=48):
    """Representative proposal bundle: compact blobs with pepper noise and
    holes (the expensive case for connected components)."""
    from hybridgl_tpu.models.sam.amg import Proposals

    h, w = hw
    masks = np.zeros((P, C, C), bool)
    boxes = np.zeros((P, 4), np.float32)
    valid = np.zeros(P, bool)
    for i in range(n_live):
        cy, cx = rng.integers(60, h - 60), rng.integers(60, w - 60)
        ry, rx = rng.integers(30, 120), rng.integers(30, 120)
        y0, y1 = max(cy - ry, 0), min(cy + ry, h)
        x0, x1 = max(cx - rx, 0), min(cx + rx, w)
        blob = rng.random((y1 - y0, x1 - x0)) > 0.25  # noisy: many islands
        masks[i, y0:y1, x0:x1] = blob
        boxes[i] = [x0, y0, x1 - 1, y1 - 1]
        valid[i] = True
    areas = masks.sum(axis=(1, 2)).astype(np.float32)
    return Proposals(
        masks=masks,
        boxes_xyxy=boxes,
        iou_preds=valid.astype(np.float32),
        stability=valid.astype(np.float32),
        points=np.zeros((P, 2), np.float32),
        areas=areas,
        valid=valid,
        num=np.asarray(n_live, np.int32),
    )


def run_one(bundle, hw):
    from hybridgl_tpu.pipeline.postprocess import postprocess_small_regions

    b = bundle._replace(masks=bundle.masks.copy(), valid=bundle.valid.copy())
    return postprocess_small_regions(b, 800, 0.7, hw=hw, inplace_masks=True)


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    hw = (480, 640)
    rng = np.random.default_rng(0)
    bundles = [make_bundle(rng, P=P, hw=hw) for _ in range(n_images)]
    ncpu = os.cpu_count() or 1
    print(f"# nproc={ncpu} n_images={n_images} P={P} live=48 noisy blobs")

    def timed(label, fn, n_items=n_images):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{label:10s}: {dt * 1e3:8.1f} ms total, {dt / n_items * 1e3:7.1f} ms/img")
        return out, dt

    # 1-image wall (threads=1) — the denominator of the verdict's ratio
    os.environ["HYBRIDGL_CLEANUP_THREADS"] = "1"
    _, t1 = timed("1-image", lambda: run_one(bundles[0], hw), n_items=1)

    ref, t_serial = timed(
        "serial", lambda: [run_one(b, hw) for b in bundles]
    )

    os.environ["HYBRIDGL_CLEANUP_THREADS"] = str(ncpu)
    pooled, t_pool = timed("pooled", lambda: [run_one(b, hw) for b in bundles])

    def overlapped():
        from concurrent.futures import ThreadPoolExecutor

        os.environ["HYBRIDGL_CLEANUP_THREADS"] = "1"
        with ThreadPoolExecutor(max_workers=n_images) as pool:
            return list(pool.map(lambda b: run_one(b, hw), bundles))

    over, t_over = timed("overlapped", overlapped)

    # identical results across all configurations
    for alt, name in ((pooled, "pooled"), (over, "overlapped")):
        for a, b in zip(ref, alt):
            np.testing.assert_array_equal(a.masks, b.masks, err_msg=name)
            np.testing.assert_array_equal(a.valid, b.valid, err_msg=name)
            np.testing.assert_allclose(a.boxes_xyxy, b.boxes_xyxy, err_msg=name)
    print("# pooled/overlapped results identical to serial")
    best = min(t_pool, t_over)
    print(
        f"# {n_images}-image wall vs 1-image: serial {t_serial / t1:.1f}x, "
        f"best-threaded {best / t1:.1f}x (target <= ~2x on a multi-core host)"
    )


if __name__ == "__main__":
    main()
