#!/usr/bin/env python
"""A/B the AMG decode scan's unroll factor on the real chip.

The multicrop pass-1 wall is the decode scan (STATUS: 342 us/point in-scan
vs ~40-50 us/point HBM SOL), attributed to per-op DMA *latency* — ~150
small weight/activation prefetches per chunk whose starts serialize because
each op's compute is too short to hide the next op's copy. ``lax.scan``
``unroll`` interleaves N iterations in one loop body so XLA can overlap
chunk i+1's prefetches under chunk i's compute without changing any matmul
shape (the B=256 experiment showed bigger batches are NOT the answer).

Usage: python tools/bench_decode_scan.py [unroll ...]   (default: 1 2 4)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from hybridgl_tpu.core.config import AmgConfig, PipelineConfig
    from hybridgl_tpu.core.params import cast_pytree, init_sam
    from hybridgl_tpu.models.sam import amg as amg_mod
    from hybridgl_tpu.models.sam.sam import encode, predict_points, preprocess_padded
    from hybridgl_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    unrolls = [int(a) for a in sys.argv[1:]] or [1, 2, 4]

    cfg = PipelineConfig(
        sam_model=os.environ.get("BENCH_SAM", "vit_h"),
        amg=AmgConfig(pred_iou_thresh=0.0, stability_score_thresh=0.0),
    )
    sam_cfg, amg_cfg = cfg.sam, cfg.amg
    from hybridgl_tpu.models.sam.image_encoder import stack_encoder_runs

    # serve the STACKED+PREPARED layout — what the pipeline actually runs
    params = jax.jit(
        lambda k: stack_encoder_runs(
            cast_pytree(init_sam(k, sam_cfg), jnp.bfloat16), sam_cfg
        )
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    S = sam_cfg.img_size
    rh, rw = 768, 1024
    img = np.zeros((S, S, 3), np.uint8)
    img[:rh, :rw] = rng.integers(0, 255, (rh, rw, 3), np.uint8)

    @jax.jit
    def enc(p, im):
        return encode(p, preprocess_padded(im, (rh, rw), sam_cfg), sam_cfg)

    emb = jax.block_until_ready(enc(params, jnp.asarray(img)))

    # PhraseCut crop config: pps=64 -> 4096 points, B=128 -> 32 chunks
    B = int(os.environ.get("BENCH_PPB", amg_cfg.points_per_batch))
    grid01 = amg_mod.build_point_grid(64)
    chunks = jnp.asarray(amg_mod._chunk_points(grid01, B))
    n_chunks, n_pts = chunks.shape[0], chunks.shape[0] * B
    scale = jnp.asarray([rw, rh], jnp.float32)

    def make_fn(unroll):
        @jax.jit
        def run(p, emb, chunks):
            def body(_, pts01):
                coords = (pts01 * scale)[:, None, :]
                labels = jnp.ones((B, 1), jnp.float32)
                low, iou = predict_points(
                    p, emb, coords, labels, sam_cfg, multimask_output=True
                )
                # keep only scalars live (pass-1 shape), sum the logits so
                # the decoder output is consumed on-device
                return None, (iou.reshape(-1), low.sum(axis=(-2, -1)).reshape(-1))

            _, (iou, ls) = jax.lax.scan(body, None, chunks, unroll=unroll)
            return iou.sum() + ls.sum()

        return run

    trace_dir = os.environ.get("BENCH_TRACE", "")
    for u in unrolls:
        fn = make_fn(u)
        t0 = time.time()
        jax.block_until_ready(fn(params, emb, chunks))
        compile_s = time.time() - t0
        if trace_dir:
            tdir = f"{trace_dir}/unroll{u}"  # one dir per unroll: parse()
            # reads the newest xplane under the dir it is given
            jax.profiler.start_trace(tdir)
            jax.block_until_ready(fn(params, emb, chunks))
            jax.profiler.stop_trace()
            print(f"trace -> {tdir} (parse with profile_trace.py --calls 1)")
        reps = []
        for _ in range(5):
            t0 = time.time()
            jax.block_until_ready(fn(params, emb, chunks))
            reps.append((time.time() - t0) * 1000)
        med = sorted(reps)[len(reps) // 2]
        # pipelined: K different-input dispatches queued back-to-back with
        # ONE closing block — the tunnel's per-dispatch round trip (~25 ms
        # on axon) overlaps the device work, as it does in the production
        # pipeline's async dispatch stream. Different inputs defeat the
        # tunnel's same-args memo.
        K = 3
        variants = [
            jnp.asarray(np.roll(np.asarray(chunks), i, axis=0)) for i in range(K)
        ]
        jax.block_until_ready([fn(params, emb, v) for v in variants])  # warm
        pipel = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready([fn(params, emb, v) for v in variants])
            pipel.append((time.time() - t0) * 1000 / K)
        pmed = sorted(pipel)[len(pipel) // 2]
        print(
            f"unroll={u}: {med:7.1f} ms/{n_chunks} chunks "
            f"({med / n_pts * 1000:6.0f} us/pt; compile {compile_s:.0f}s; "
            f"reps {min(reps):.0f}-{max(reps):.0f}; "
            f"pipelined {pmed:.1f} ms = {pmed / n_pts * 1000:.0f} us/pt)"
        )


if __name__ == "__main__":
    main()
