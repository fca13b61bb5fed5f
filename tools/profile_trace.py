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


def capture(out_dir: str, sam_model: str, multicrop: bool = False):
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from hybridgl_tpu.core.config import AMG_PHRASECUT, AmgConfig, PipelineConfig
    from hybridgl_tpu.core.params import cast_pytree, init_sam
    from hybridgl_tpu.models.sam import amg as amg_mod

    cfg = PipelineConfig(
        sam_model=sam_model,
        amg=dataclasses.replace(
            AMG_PHRASECUT, pred_iou_thresh=0.0, stability_score_thresh=0.0
        )
        if multicrop
        else AmgConfig(pred_iou_thresh=0.0, stability_score_thresh=0.0),
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

    if multicrop:
        # the 5-crop PhraseCut path also needs the canonical frame the
        # crops are cut from
        img_c = jnp.asarray(rng.integers(0, 255, (C, C, 3), np.uint8))

        @jax.jit
        def full(p, im):
            return amg_mod.generate_proposals_multicrop(
                p, im, rh, rw, img_c, h, w, sam_cfg, cfg.amg, C
            )

    else:

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


def capture_feature(out_dir: str):
    """Trace the crops+fusion feature stage (CLIP G2L + GEM features)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from hybridgl_tpu.core.config import PipelineConfig
    from hybridgl_tpu.core.params import cast_pytree, init_clip
    from hybridgl_tpu.models.clip.fusion import hybrid_forward
    from hybridgl_tpu.models.gem.gem import gem_image_features, gem_preprocess
    from hybridgl_tpu.pipeline.preprocess import build_crops
    from hybridgl_tpu.pipeline.runner import _stack_clip_params
    from hybridgl_tpu.kernels.resize import resize_bilinear

    cfg = PipelineConfig(fusion_mode="G2L")
    clip_cfg = cfg.clip
    params = jax.jit(
        lambda k: _stack_clip_params(cast_pytree(init_clip(k, clip_cfg), jnp.bfloat16))
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    C = cfg.canonical_size
    P = cfg.amg.max_proposals
    h, w = 480, 640

    @jax.jit
    def feature(p, image_c, masks):
        glob, local = build_crops(image_c, masks, (h, w), cfg.crop_size, cfg.blur_ksize)
        feats = hybrid_forward(
            p["visual"], local, glob, masks.astype(jnp.float32), clip_cfg,
            fusion_mode=cfg.fusion_mode, masking_block=cfg.guidance.masking_block,
            compat=cfg.compat, masks_hw=(h, w),
        )
        gem_u8 = jnp.round(
            resize_bilinear(image_c, (cfg.gem.img_size, cfg.gem.img_size), src_hw=(h, w))
        ).astype(jnp.uint8)
        gem_img = gem_preprocess(gem_u8, cfg.gem.img_size)
        gem_pf, _, _ = gem_image_features(p["visual"], gem_img[None], clip_cfg, cfg.gem)
        return feats, gem_pf

    def inputs():
        img = jnp.asarray(rng.integers(0, 255, (C, C, 3), np.uint8))
        masks = jnp.asarray(rng.random((P, C, C)) > 0.7)
        return img, masks

    warm = inputs()
    jax.block_until_ready(feature(params, *warm))
    ins = [inputs() for _ in range(3)]
    os.makedirs(out_dir, exist_ok=True)
    jax.profiler.start_trace(out_dir)
    outs = [feature(params, *i) for i in ins]
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
    p.add_argument("--stage", default="amg", choices=["amg", "feature", "multicrop"])
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--calls", type=int, default=3, help="timed calls in the trace")
    args = p.parse_args()
    if args.out:
        if args.stage == "feature":
            capture_feature(args.out)
        else:
            capture(args.out, args.sam, multicrop=args.stage == "multicrop")
    if args.parse:
        parse(args.parse, args.top, args.calls)
    if not args.out and not args.parse:
        p.error("pass --out and/or --parse")


if __name__ == "__main__":
    main()
