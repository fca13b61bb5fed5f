#!/usr/bin/env python
"""Break down proposal-stage device time (run on the real chip).

Times three nested jits with identical inputs: SAM encode only, encode +
all decoder chunks, and the full generate_proposals (adds canonical
placement, stability, boxes, NMS, re-decode). Differences isolate the
cost of each phase.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def _force(out):
    """Force a scalar read (block_until_ready alone can return early on the
    tunneled backend when a result was served from its memo)."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    return float(abs(leaves[0]).sum())


def timeit(fn, params, images, iters=5):
    """Median wall over ``iters`` calls, each on a DIFFERENT image: the
    tunnel memoizes identical dispatches, so same-input loops time a cache."""
    _force(fn(params, images[0]))  # compile
    times = []
    for i in range(iters):
        t0 = time.time()
        _force(fn(params, images[1 + (i % (len(images) - 1))]))
        times.append((time.time() - t0) * 1000)
    return sorted(times)[len(times) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from hybridgl_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from hybridgl_tpu.core.config import AmgConfig, PipelineConfig
    from hybridgl_tpu.core.params import cast_pytree, init_sam
    from hybridgl_tpu.models.sam import amg as amg_mod
    from hybridgl_tpu.models.sam.sam import encode, predict_points, preprocess_padded

    cfg = PipelineConfig(
        sam_model=os.environ.get("BENCH_SAM", "vit_h"),
        amg=AmgConfig(pred_iou_thresh=0.0, stability_score_thresh=0.0),
    )
    sam_cfg, amg_cfg = cfg.sam, cfg.amg
    params = cast_pytree(init_sam(jax.random.PRNGKey(0), sam_cfg), jnp.bfloat16)
    rng = np.random.default_rng(0)
    S, C = sam_cfg.img_size, cfg.canonical_size
    rh, rw, h, w = 768, 1024, 480, 640
    imgs = []
    for _ in range(7):
        a = np.zeros((S, S, 3), np.uint8)
        a[:rh, :rw] = rng.integers(0, 255, (rh, rw, 3), np.uint8)
        imgs.append(jnp.asarray(a))

    @jax.jit
    def enc_only(p, im):
        return encode(p, preprocess_padded(im, (rh, rw), sam_cfg), sam_cfg)

    @jax.jit
    def enc_decode(p, im):
        emb = encode(p, preprocess_padded(im, (rh, rw), sam_cfg), sam_cfg)
        grid = amg_mod.build_point_grid(amg_cfg.points_per_side)
        coords = jnp.asarray(grid) * jnp.asarray([rw, rh], jnp.float32)
        low, iou = predict_points(
            p, emb, coords[:, None, :], jnp.ones((len(grid), 1), jnp.float32), sam_cfg
        )
        return low.sum(), iou.sum()

    @jax.jit
    def full(p, im):
        return amg_mod.generate_proposals(p, im, rh, rw, h, w, sam_cfg, amg_cfg, C)

    t_enc = timeit(enc_only, params, imgs)
    t_dec = timeit(enc_decode, params, imgs)
    t_full = timeit(full, params, imgs)
    print(f"encode only:        {t_enc:8.1f} ms")
    print(f"+ decode grid:      {t_dec:8.1f} ms  (decode ~{t_dec - t_enc:.1f})")
    print(f"full proposals:     {t_full:8.1f} ms  (place/score/NMS/redecode ~{t_full - t_dec:.1f})")


if __name__ == "__main__":
    main()
