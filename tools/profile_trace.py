#!/usr/bin/env python
"""Capture + analyse a device trace of any pipeline stage.

    python tools/profile_trace.py --out /tmp/jtrace          # capture AMG
    python tools/profile_trace.py --parse /tmp/jtrace        # rank ops

The parse step reads the xplane protobuf (via tensorflow.tsl protos) and
prints device op time grouped by category and by op shape — the workflow
that located the pass-2 re-decode and f32 attention-bias costs.
"""

import argparse
import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def capture(out_dir: str, sam_model: str):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from hybridgl_tpu.core.config import AmgConfig, PipelineConfig
    from hybridgl_tpu.core.params import cast_pytree, init_sam
    from hybridgl_tpu.models.sam import amg as amg_mod

    cfg = PipelineConfig(
        sam_model=sam_model,
        amg=AmgConfig(pred_iou_thresh=0.0, stability_score_thresh=0.0),
    )
    sam_cfg = cfg.sam
    from hybridgl_tpu.models.sam.image_encoder import stack_encoder_runs

    # pre-stacked scan layout — what the pipeline actually serves
    params = jax.jit(
        lambda k: stack_encoder_runs(
            cast_pytree(init_sam(k, sam_cfg), jnp.bfloat16), sam_cfg
        )
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    S, C = sam_cfg.img_size, cfg.canonical_size
    rh, rw, h, w = 768, 1024, 480, 640
    imgs = []
    for _ in range(4):
        a = np.zeros((S, S, 3), np.uint8)
        a[:rh, :rw] = rng.integers(0, 255, (rh, rw, 3), np.uint8)
        imgs.append(jnp.asarray(a))

    @jax.jit
    def full(p, im):
        return amg_mod.generate_proposals(p, im, rh, rw, h, w, sam_cfg, cfg.amg, C)

    jax.block_until_ready(full(params, imgs[-1]))
    os.makedirs(out_dir, exist_ok=True)
    jax.profiler.start_trace(out_dir)
    outs = [full(params, imgs[i]) for i in range(3)]
    jax.block_until_ready(outs)
    jax.profiler.stop_trace()
    print("trace:", glob.glob(f"{out_dir}/**/*.xplane.pb", recursive=True))


def parse(trace_dir: str, top: int = 20, calls: int = 3):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        md = plane.event_metadata
        cat = collections.Counter()
        ops = collections.Counter()
        total = 0.0
        for line in plane.lines:
            for ev in line.events:
                name = (
                    md[ev.metadata_id].name if ev.metadata_id in md else str(ev.metadata_id)
                )
                if name.startswith("jit_"):
                    continue  # outer envelope
                ms = ev.duration_ps / 1e9
                total += ms
                m = re.match(r"%?([a-zA-Z\-_]+)[\.0-9]*\s*=?\s*(\S*)", name)
                kind = m.group(1) if m else name[:20]
                cat[kind] += ms
                ops[f"{kind} {(m.group(2)[:60] if m else '')}"] += ms
        print(f"== {plane.name}: {total / calls:.1f} ms/call (async ops overlap)")
        print("-- by category:")
        for k, v in cat.most_common(12):
            print(f"  {v / calls:8.2f} ms/call  {k}")
        print("-- top op shapes:")
        for k, v in ops.most_common(top):
            print(f"  {v / calls:8.2f} ms/call  {k}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="", help="capture a trace into this dir")
    p.add_argument("--parse", default="", help="parse a captured trace dir")
    p.add_argument("--sam", default="vit_h")
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--calls", type=int, default=3, help="timed calls in the trace")
    args = p.parse_args()
    if args.out:
        capture(args.out, args.sam)
    if args.parse:
        parse(args.parse, args.top, args.calls)
    if not args.out and not args.parse:
        p.error("pass --out and/or --parse")


if __name__ == "__main__":
    main()
