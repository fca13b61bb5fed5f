"""Isolated A/B bench for the SAM windowed-attention blocks (VERDICT r2 #1).

Measures the 28-block windowed wall (ViT-H geometry: 64x64 grid -> 25
windows of 14x14, D=1280, 16 heads) under the XLA factored-view path vs
the Pallas flash path, on whatever backend is live.

Timing discipline (memory: tunnel memoizes identical inputs; a single
block_until_ready can return early): vary inputs per rep and force a
scalar read of the result.

Usage: python tools/bench_windowed.py [--reps 5] [--blocks 28]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hybridgl_tpu.core.config import SamConfig
from hybridgl_tpu.models.sam import image_encoder as enc


def make_block_params(key, depth, D=1280, heads=16, window=14, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 12)
    hd = D // heads
    mlp = 4 * D

    def nrm(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    def stack(shape_fn):
        return jnp.stack([shape_fn(i) for i in range(depth)])

    p = {
        "ln_1": {
            "scale": jnp.ones((depth, D), jnp.float32),
            "bias": jnp.zeros((depth, D), jnp.float32),
        },
        "ln_2": {
            "scale": jnp.ones((depth, D), jnp.float32),
            "bias": jnp.zeros((depth, D), jnp.float32),
        },
        "attn": {
            "qkv_w": nrm(ks[0], (depth, D, 3 * D)),
            "qkv_b": nrm(ks[1], (depth, 3 * D)),
            "proj_w": nrm(ks[2], (depth, D, D)),
            "proj_b": nrm(ks[3], (depth, D)),
            "rel_pos_h": nrm(ks[4], (depth, 2 * window - 1, hd)),
            "rel_pos_w": nrm(ks[5], (depth, 2 * window - 1, hd)),
        },
        "mlp_fc": {"w": nrm(ks[6], (depth, D, mlp)), "b": nrm(ks[7], (depth, mlp))},
        "mlp_proj": {"w": nrm(ks[8], (depth, mlp, D)), "b": nrm(ks[9], (depth, D))},
    }
    # serving layout (stack_encoder_runs): rel-pos tables precomputed so the
    # scan body never gathers from the stacked (2G-1, hd) params in-loop
    idx = np.arange(window)[:, None] - np.arange(window)[None, :] + window - 1
    p["attn"]["rel_tab_h"] = p["attn"]["rel_pos_h"][:, idx]
    p["attn"]["rel_tab_w"] = p["attn"]["rel_pos_w"][:, idx]
    return p


def add_fold_tables(p, depth, D=1280, heads=16, window=14):
    """Mirror stack_encoder_runs' Wq-folded rel tables (HYBRIDGL_REL_FOLD)
    for the hand-stacked bench params: rel term = x @ (Wq Rh^T) + bq Rh^T."""
    attn = dict(p["attn"])
    hd = D // heads
    wq = attn["qkv_w"][:, :, : heads * hd].reshape(depth, D, heads, hd)
    bq = attn["qkv_b"][:, : heads * hd].reshape(depth, heads, hd)
    for nm in ("h", "w"):
        tab = attn[f"rel_tab_{nm}"].astype(jnp.float32)  # [depth, G, G, hd]
        fold = jnp.einsum("zdhc,zqkc->zqdhk", wq.astype(jnp.float32), tab)
        attn[f"rel_fold_{nm}"] = fold.reshape(
            depth, window, D, heads * window
        ).astype(wq.dtype)
        attn[f"rel_fold_{nm}b"] = jnp.einsum(
            "zhc,zqkc->zqhk", bq.astype(jnp.float32), tab
        ).reshape(depth, window, heads * window)
    out = dict(p)
    out["attn"] = attn
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--blocks", type=int, default=28)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument(
        "--only", choices=["xla-factored", "flash", "flash+fold"], default=None
    )
    ap.add_argument(
        "--trace",
        default="",
        help="capture a device trace of the timed reps into this dir "
        "(parse with tools/profile_trace.py --parse DIR --calls REPS)",
    )
    args = ap.parse_args()

    from hybridgl_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = SamConfig(
        img_size=args.grid * 16,
        encoder_width=1280,
        encoder_depth=args.blocks,
        encoder_heads=16,
        encoder_global_idx=(),
        window_size=14,
    )
    key = jax.random.PRNGKey(0)
    params = make_block_params(key, args.blocks)

    def make_run():
        # fresh function object per variant: jax.jit's global cache is keyed
        # on the function identity, so reusing one closure would silently
        # reuse the first variant's executable for the second
        def run(stacked, x):
            def body(h, bp):
                return enc.encoder_block(bp, h, cfg, cfg.window_size), None

            out, _ = jax.lax.scan(
                body, x, stacked, unroll=int(os.environ.get("BENCH_UNROLL", "1"))
            )
            return out

        return jax.jit(run)

    xs = [
        jax.random.normal(jax.random.PRNGKey(i + 1), (1, args.grid, args.grid, 1280), jnp.float32).astype(jnp.bfloat16)
        for i in range(args.reps + 1)
    ]

    fold_params = add_fold_tables(params, args.blocks)

    for label, env in (("xla-factored", "0"), ("flash", "1"), ("flash+fold", "1")):
        if args.only and not label.startswith(args.only):
            continue
        if label == "flash+fold":
            params = fold_params
        os.environ["HYBRIDGL_FLASH_WINDOWED"] = env
        jit_run = make_run()
        # warmup (compile)
        t0 = time.time()
        r = jit_run(params, xs[0])
        float(r.sum())
        compile_s = time.time() - t0
        times = []
        if args.trace:
            jax.profiler.start_trace(args.trace)
        for i in range(args.reps):
            t0 = time.time()
            r = jit_run(params, xs[i + 1])
            float(r.sum())  # forced scalar read
            times.append(time.time() - t0)
        if args.trace:
            jax.profiler.stop_trace()
        med = sorted(times)[len(times) // 2]
        per_block = med / args.blocks * 1000
        print(
            f"{label:14s} compile {compile_s:6.1f}s | median {med * 1000:8.2f} ms"
            f" /{args.blocks} blocks = {per_block:6.2f} ms/block | reps "
            + " ".join(f"{t * 1000:.1f}" for t in times),
            flush=True,
        )


if __name__ == "__main__":
    main()
