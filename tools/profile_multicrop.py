#!/usr/bin/env python
"""Break down the multicrop (PhraseCut-config) proposal stage on the chip.

Times three nested jits on identical inputs: the five-frame encoder scan,
encoder + the raw pass-1 grid decode (all crops' point chunks through
predict_points, blocked output consumed on device), and the full
generate_proposals_multicrop (adds pass-1 stats/boxes, per-crop + cross-
crop NMS, pass-2 re-decode, canonical placement). Differences isolate the
three cost centers the VERDICT r4 #1 target cares about.

Reference cost centers: automatic_mask_generator.py:197-264 (crops loop),
:266-321 (_process_batch). Usage: python tools/profile_multicrop.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def _force(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    return float(abs(jax.numpy.asarray(leaves[0]).astype("float32")).sum())


def timeit(fn, *args, iters=5, imgs=None, params=None):
    times = []
    for i in range(iters):
        t0 = time.time()
        _force(fn(params, imgs[1 + (i % (len(imgs) - 1))], *args))
        times.append((time.time() - t0) * 1000)
    return sorted(times)[len(times) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from hybridgl_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from hybridgl_tpu.core.config import AMG_PHRASECUT, PipelineConfig
    from hybridgl_tpu.core.params import cast_pytree, init_sam
    from hybridgl_tpu.models.sam import amg as amg_mod
    from hybridgl_tpu.models.sam.image_encoder import (
        encode_image,
        stack_encoder_runs,
    )
    from hybridgl_tpu.models.sam.sam import predict_points, preprocess_padded

    amg_cfg = AMG_PHRASECUT
    if os.environ.get("BENCH_PPB"):
        import dataclasses

        amg_cfg = dataclasses.replace(
            amg_cfg, points_per_batch=int(os.environ["BENCH_PPB"])
        )
    cfg = PipelineConfig(
        sam_model=os.environ.get("BENCH_SAM", "vit_h"), amg=amg_cfg
    )
    sam_cfg = cfg.sam
    params = jax.jit(
        lambda k: stack_encoder_runs(
            cast_pytree(init_sam(k, sam_cfg), jnp.bfloat16), sam_cfg
        )
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    S, C = sam_cfg.img_size, cfg.canonical_size
    rh, rw, h, w = 768, 1024, 480, 640
    imgs, cimgs = [], []
    for _ in range(6):
        a = np.zeros((S, S, 3), np.uint8)
        a[:rh, :rw] = rng.integers(0, 255, (rh, rw, 3), np.uint8)
        imgs.append(jnp.asarray(a))
        cimgs.append(jnp.asarray(rng.integers(0, 255, (C, C, 3), np.uint8)))

    # the five preprocessed frames + grids, mirroring generate_proposals_multicrop
    def frames_and_grids(img1024, imgc):
        from hybridgl_tpu.kernels.resize import place_region

        ds = amg_cfg.crop_n_points_downscale_factor
        grid_full = amg_mod.build_point_grid(amg_cfg.points_per_side)
        grid_crop = amg_mod.build_point_grid(
            max(int(amg_cfg.points_per_side / ds), 1)
        )
        frames = [preprocess_padded(img1024, (rh, rw), sam_cfg)]
        rhws = [(rh, rw)]
        grids = [grid_full]
        for (cy0, cx0, ch_, cw_) in amg_mod._crop_boxes_layer1(
            h, w, amg_cfg.crop_overlap_ratio
        ):
            long_side = jnp.maximum(ch_, cw_)
            scale = S / long_side
            crh = jnp.floor(ch_ * scale + 0.5).astype(jnp.int32)
            crw = jnp.floor(cw_ * scale + 0.5).astype(jnp.int32)
            frame = place_region(
                imgc.astype(jnp.float32),
                (ch_, cw_),
                (S, S),
                (0, 0),
                (crh, crw),
                src_origin=(cy0, cx0),
            )
            frames.append(preprocess_padded(frame, (crh, crw), sam_cfg))
            rhws.append((crh, crw))
            grids.append(grid_crop)
        return frames, rhws, grids

    @jax.jit
    def enc5(p, img1024, imgc):
        frames, _, _ = frames_and_grids(img1024, imgc)

        def body(_, f):
            return None, encode_image(p["encoder"], f[None], sam_cfg)[0]

        _, embs = jax.lax.scan(body, None, jnp.stack(frames))
        return embs.sum()

    @jax.jit
    def enc5_decode(p, img1024, imgc):
        frames, rhws, grids = frames_and_grids(img1024, imgc)

        def body(_, f):
            return None, encode_image(p["encoder"], f[None], sam_cfg)[0]

        _, embs = jax.lax.scan(body, None, jnp.stack(frames))
        B = amg_cfg.points_per_batch
        tot = jnp.float32(0.0)
        for ci, grid in enumerate(grids):
            chunks = jnp.asarray(amg_mod._chunk_points(grid, B))
            crh, crw = rhws[ci]
            scale = jnp.stack(
                [jnp.asarray(crw, jnp.float32), jnp.asarray(crh, jnp.float32)]
            )

            def body2(_, pts01):
                coords = (pts01 * scale)[:, None, :]
                low, iou = predict_points(
                    p, embs[ci], coords, jnp.ones((B, 1), jnp.float32),
                    sam_cfg, multimask_output=True, return_blocked=True,
                )
                return None, (iou.sum(), low.sum())

            _, (iou_s, low_s) = jax.lax.scan(body2, None, chunks)
            tot = tot + iou_s.sum() + low_s.sum()
        return tot

    @jax.jit
    def enc5_pass1(p, img1024, imgc):
        # encoder + the full per-crop pass-1 (_score_crop_candidates: decode
        # + half-transform + stats kernel + boxes), no NMS/pass-2/placement
        frames, rhws, grids = frames_and_grids(img1024, imgc)

        def body(_, f):
            return None, encode_image(p["encoder"], f[None], sam_cfg)[0]

        _, embs = jax.lax.scan(body, None, jnp.stack(frames))
        origins = [(jnp.float32(0), jnp.float32(0))] + [
            (cy0, cx0)
            for (cy0, cx0, _, _) in amg_mod._crop_boxes_layer1(
                h, w, amg_cfg.crop_overlap_ratio
            )
        ]
        extents = [
            (jnp.asarray(h, jnp.float32), jnp.asarray(w, jnp.float32))
        ] + [
            (ch_, cw_)
            for (_, _, ch_, cw_) in amg_mod._crop_boxes_layer1(
                h, w, amg_cfg.crop_overlap_ratio
            )
        ]
        tot = jnp.float32(0.0)
        for ci, grid in enumerate(grids):
            iou_c, stab_c, boxes_c, valid_c, _n = amg_mod._score_crop_candidates(
                p, embs[ci], grid, origins[ci], extents[ci], rhws[ci],
                (h, w), sam_cfg, amg_cfg, C,
            )
            tot = tot + iou_c.sum() + stab_c.sum() + boxes_c.sum() + valid_c.sum()
        return tot

    @jax.jit
    def full(p, img1024, imgc):
        props = amg_mod.generate_proposals_multicrop(
            p, img1024, rh, rw, imgc, h, w, sam_cfg, amg_cfg, C
        )
        return props.iou_preds.sum()

    n_pts = amg_cfg.points_per_side**2 + 4 * max(
        int(amg_cfg.points_per_side / amg_cfg.crop_n_points_downscale_factor), 1
    ) ** 2
    for name, fn, args in (
        ("encode x5", enc5, ()),
        ("+ grid decode", enc5_decode, ()),
        ("+ pass1 stats", enc5_pass1, ()),
        ("full multicrop", full, ()),
    ):
        t0 = time.time()
        _force(fn(params, imgs[0], cimgs[0]))
        c = time.time() - t0
        med = timeit(
            lambda p, im, i=0: fn(p, im, cimgs[1]), params=params, imgs=imgs
        )
        print(f"{name:16s} {med:8.1f} ms  (compile {c:.0f}s)")
        results = locals().setdefault("_acc", [])
        results.append((name, med))
    enc, dec, p1, ful = [r[1] for r in results]
    print(
        f"-> encode {enc:.0f} | decode {dec - enc:.0f} "
        f"({(dec - enc) / n_pts * 1000:.0f} us/pt over {n_pts} pts) | "
        f"half+stats {p1 - dec:.0f} | nms/pass2/place {ful - p1:.0f}"
    )


if __name__ == "__main__":
    main()
