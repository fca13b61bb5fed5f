"""Isolated probe: AMG pass-1 upscale/place/stats cost per point-chunk.

Compares the current gather-based bilinear chain (upscale 256->1024 ->
place into canonical frame -> stability/box/area stats) against a
matmul-form resize (dense [out, in] sampling matrices on the MXU) for the
PhraseCut multicrop geometry. Prints per-chunk ms; one full image is
~128 chunks (64 full-grid + 4 crops x 16).

Usage: python tools/bench_upscale.py [--reps 5] [--bm 192]
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
from hybridgl_tpu.kernels.masks import mask_to_box, stability_score
from hybridgl_tpu.kernels.resize import place_region, _resample_weights
from hybridgl_tpu.models.sam.sam import upscale_logits_to_input_frame

CAN = 1024


def stats_of(logits, thresh=0.0, offset=1.0):
    stab = stability_score(logits, thresh, offset)
    masks = logits > thresh
    boxes = mask_to_box(masks)
    nonempty = masks.any(axis=(-2, -1))
    return stab, boxes, nonempty


def gather_chain(low, rh, rw, y0, x0, ch, cw, sam_cfg):
    up = upscale_logits_to_input_frame(low, sam_cfg)

    def place(m):
        return place_region(m, (rh, rw), (CAN, CAN), (y0, x0), (ch, cw), fill=-1e4)

    logits = jax.vmap(place)(up)
    return stats_of(logits)


def matmul_chain(low, rh, rw, y0, x0, ch, cw, sam_cfg):
    # one composed [CAN, 256] sampling matrix per axis: canonical pixel ->
    # (place_region of the 1024 frame) -> (4x upscale of the 256 logits)
    S = sam_cfg.img_size  # 1024

    def axis_weights(origin, dst_e, src_e, n_src_small):
        # stage 2: canonical row i samples 1024-frame coord c2
        i = jnp.arange(CAN, dtype=jnp.float32)
        c2 = jnp.clip(
            (i - origin + 0.5) * (jnp.asarray(src_e, jnp.float32) / dst_e) - 0.5,
            0.0,
            jnp.asarray(src_e, jnp.float32) - 1.0,
        )
        # stage 1: 1024-frame coord -> 256-frame coord (uniform S/n ratio)
        scale1 = n_src_small / S
        c1 = jnp.clip((c2 + 0.5) * scale1 - 0.5, 0.0, n_src_small - 1.0)
        j = jnp.arange(n_src_small, dtype=jnp.float32)[None, :]
        # BUT the two-stage chain first rounds c2 to its two integer taps;
        # compose exactly: out[i] = (1-wy)*u[f] + wy*u[f+1], u[k] = bilinear
        # of the 256 row at coord g(k). Build [CAN, 256] by summing the two
        # stage-2 taps' stage-1 weight rows.
        f = jnp.floor(c2)
        wy = (c2 - f)[:, None]
        taps = []
        for tap, w in ((f, 1.0 - wy), (jnp.minimum(f + 1.0, jnp.asarray(src_e, jnp.float32) - 1.0), wy)):
            g = jnp.clip((tap + 0.5) * scale1 - 0.5, 0.0, n_src_small - 1.0)[:, None]
            gf = jnp.floor(g)
            wg = g - gf
            w_row = jnp.where(j == gf, 1.0 - wg, 0.0) + jnp.where(j == gf + 1.0, wg, 0.0)
            taps.append(w * w_row)
        return taps[0] + taps[1]

    Wy = axis_weights(y0, ch, rh, low.shape[-2])
    Wx = axis_weights(x0, cw, rw, low.shape[-1])
    logits = jnp.einsum("or,brc,pc->bop", Wy, low, Wx)
    i = jnp.arange(CAN, dtype=jnp.float32)
    inside = (
        (i[:, None] >= y0) & (i[:, None] < y0 + ch) & (i[None, :] >= x0) & (i[None, :] < x0 + cw)
    )
    logits = jnp.where(inside[None], logits, -1e4)
    return stats_of(logits)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--bm", type=int, default=192)
    ap.add_argument("--only", choices=["gather", "matmul"], default=None)
    args = ap.parse_args()

    from hybridgl_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    sam_cfg = SamConfig()
    BM = args.bm

    rh, rw = jnp.int32(1024), jnp.int32(768)
    y0, x0 = jnp.float32(0.0), jnp.float32(0.0)
    ch, cw = jnp.float32(512.0), jnp.float32(384.0)

    lows = [
        jax.random.normal(jax.random.PRNGKey(i), (BM, 256, 256), jnp.float32)
        for i in range(args.reps + 1)
    ]

    for label, fn in (("gather", gather_chain), ("matmul", matmul_chain)):
        if args.only and label != args.only:
            continue
        jf = jax.jit(lambda low, fn=fn: fn(low, rh, rw, y0, x0, ch, cw, sam_cfg))
        t0 = time.time()
        r = jf(lows[0])
        jax.block_until_ready(r)
        compile_s = time.time() - t0
        times = []
        for i in range(args.reps):
            t0 = time.time()
            r = jf(lows[i + 1])
            float(r[0].sum())
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        print(
            f"{label:8s} compile {compile_s:6.1f}s | median {med * 1000:8.2f} ms/chunk"
            f" (x128 chunks = {med * 128:.2f} s/img) | reps "
            + " ".join(f"{t * 1000:.0f}" for t in times),
            flush=True,
        )

    if args.only:
        return
    # numeric agreement (borderline threshold flips aside)
    g = jax.jit(lambda low: gather_chain(low, rh, rw, y0, x0, ch, cw, sam_cfg))(lows[0])
    m = jax.jit(lambda low: matmul_chain(low, rh, rw, y0, x0, ch, cw, sam_cfg))(lows[0])
    print("stab max|diff|:", float(jnp.abs(g[0] - m[0]).max()))
    print("box  max|diff|:", float(jnp.abs(g[1] - m[1]).max()))


if __name__ == "__main__":
    main()
