"""Flag-compatible eval driver (the reference's ``Hybridgl_main.py``).

Usage (mirrors reference README.md:58-62):
    hybridgl-main --dataset refcoco --split val --fusion_mode G2L

Accepts the reference's flag surface (reference: utils.py:397-471) —
including the vestigial detectron2 flags, parsed and ignored exactly like
the reference ignores them — plus TPU-native additions (checkpoint paths,
proposal bucket, resume, parity log).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..core import checkpoint as ckpt
from ..core.config import AMG_PHRASECUT, AMG_REFCOCO, PipelineConfig
from ..core.params import init_clip, init_sam
from ..eval.logging import ProgressCheckpoint, write_result_log
from ..eval.parity import ParityLog, SelectionRecord
from ..pipeline.runner import HybridGLPipeline


def default_argument_parser(epilog=None) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        epilog=epilog, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    # reference-compatible flags (utils.py:424-469); dist-era flags are
    # parsed-and-ignored for drop-in compatibility
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-only", action="store_false")
    p.add_argument("--num-gpus", type=int, default=1)
    p.add_argument("--num-machines", type=int, default=1)
    p.add_argument("--machine-rank", type=int, default=0)
    p.add_argument("--dist-url", default="")
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    p.add_argument("--clip_model", default="ViT-B/16")
    p.add_argument("--visual_proj_path", default="./pretrain/")
    p.add_argument("--dataset", default="refcocog", help="refcoco, refcoco+, refcocog")
    p.add_argument("--split", default="val", help="val, testA, testB, test")
    p.add_argument("--fusion_mode", default="G2L")
    p.add_argument("--splitBy", default="umd")
    p.add_argument("--img_size", default=480, type=int)
    p.add_argument("--refer_data_root", default="./refer/data/")
    p.add_argument("--show_results", action="store_true")
    # TPU-native additions
    p.add_argument("--sam_model", default="vit_h", help="vit_b, vit_l, vit_h")
    p.add_argument("--sam_checkpoint", default="", help="converted .npz/orbax dir, or a torch .pth")
    p.add_argument("--clip_checkpoint", default="", help="converted .npz/orbax dir, or a torch .pt")
    p.add_argument("--random-weights", action="store_true", help="random init (smoke runs)")
    p.add_argument("--max_proposals", type=int, default=0, help="proposal bucket override")
    p.add_argument("--max_images", type=int, default=0, help="truncate the eval set")
    p.add_argument("--log_dir", default="./result_log")
    p.add_argument("--parity_log", default="", help="write per-ref selection log here")
    p.add_argument("--progress_file", default="", help="checkpoint/resume eval progress")
    p.add_argument("--no-bug-compat", action="store_true", help="disable reference quirk reproduction")
    p.add_argument("--profile", action="store_true", help="print a per-stage time summary")
    p.add_argument("--trace_dir", default="", help="capture a jax profiler trace here")
    p.add_argument(
        "--data_parallel",
        action="store_true",
        help="shard the eval over all local devices (full pipeline per image, "
        "psum'd metrics; exact parity with the sequential driver — in-step "
        "device cleanup + host-side sticky-clamp replay, parallel/full_eval.py)",
    )
    return p


def load_params(args, cfg: PipelineConfig):
    import jax

    if args.random_weights:
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        return init_sam(k1, cfg.sam), init_clip(k2, cfg.clip)
    if not args.sam_checkpoint or not args.clip_checkpoint:
        raise SystemExit(
            "--sam_checkpoint and --clip_checkpoint are required "
            "(or pass --random-weights for a smoke run). Convert torch "
            "checkpoints with tools/convert_checkpoints.py."
        )

    def load_one(path, kind):
        if path.endswith((".pth", ".pt")):
            from ..core import convert

            loader = convert.load_torch_sam if kind == "sam" else convert.load_torch_clip
            params, _ = loader(path)
            return params
        return ckpt.load(path)

    return load_one(args.sam_checkpoint, "sam"), load_one(args.clip_checkpoint, "clip")


def build_config(args) -> PipelineConfig:
    dataset = args.dataset
    split_by = "umd" if dataset == "refcocog" else "unc"
    amg = AMG_PHRASECUT if dataset == "phrasecut" else AMG_REFCOCO
    if args.max_proposals:
        import dataclasses

        amg = dataclasses.replace(amg, max_proposals=args.max_proposals)
    cfg = PipelineConfig(
        clip_model=args.clip_model,
        sam_model=args.sam_model,
        fusion_mode=args.fusion_mode,
        amg=amg,
        canonical_size=1024 if dataset == "phrasecut" else 640,
    )
    if args.clip_model == "test-tiny" or args.sam_model == "test-tiny":
        from ..core.config import tiny_smoke_config

        cfg = tiny_smoke_config(
            fusion_mode=args.fusion_mode,
            min_mask_region_area=amg.min_mask_region_area,
        )
    if args.no_bug_compat:
        from ..core.config import CompatConfig

        cfg = cfg.replace(compat=CompatConfig(False, False, False))
    args.splitBy = split_by  # reference overrides the flag (Hybridgl_main.py:26-29)
    return cfg


def main(argv=None) -> None:
    args = default_argument_parser().parse_args(argv)
    assert args.eval_only, "Only eval_only available!"
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # warm restarts skip the ~90s stage compiles
    cfg = build_config(args)
    sam_params, clip_params = load_params(args, cfg)
    pipe = HybridGLPipeline(cfg, sam_params, clip_params)
    # name the active expression parser up front: a silent heuristic
    # fallback would quietly change selections vs the reference
    print(f"expression parser: {type(pipe.parser).__name__}", flush=True)
    if args.profile:
        from ..utils.profiling import StageTimer

        pipe.timer = StageTimer(block=True)

    if args.dataset == "phrasecut":
        from ..data.datasets import PhraseCutDataset

        dataset = PhraseCutDataset(
            args.refer_data_root, split=args.split, canonical=cfg.canonical_size
        )
        ref_ids = list(range(len(dataset)))
    else:
        from ..data.datasets import ReferDataset

        dataset = ReferDataset(
            args.refer_data_root,
            args.dataset,
            args.splitBy,
            args.split,
            sam_img_size=cfg.sam.img_size,
            canonical=cfg.canonical_size,
        )
        ref_ids = dataset.ref_ids

    n = len(dataset)
    if args.max_images:
        n = min(n, args.max_images)

    state = pipe.init_state()
    progress = ProgressCheckpoint(args.progress_file or None)
    start = progress.load(state) if args.resume else 0
    parity = ParityLog(
        meta=dict(dataset=args.dataset, split=args.split, fusion=args.fusion_mode)
    )

    from ..data.prefetch import IndexedPrefetcher
    from ..utils.profiling import capture_trace

    t0 = time.time()
    images_done = 0
    it = iter(IndexedPrefetcher(_Sliced(dataset, start, n)))
    trace_ctx = capture_trace(args.trace_dir or None)
    trace_ctx.__enter__()

    if args.data_parallel:
        _run_data_parallel(args, cfg, pipe, it, ref_ids, start, n, state, parity, t0)
        trace_ctx.__exit__(None, None, None)
        _finish(args, cfg, state, parity, t0, n)
        return

    # run_dataset software-pipelines host cleanup with the next image's
    # device proposal stage
    from ..pipeline.runner import materialize_results

    for offset, item in enumerate(pipe.run_dataset(it, state, yield_props=args.show_results)):
        if args.show_results:
            sample, results, props = item
        else:
            sample, results = item
            props = None
        i = start + offset
        images_done += 1
        results = materialize_results(results)
        if props is not None and images_done <= 50:
            _save_result_overlays(args.log_dir, i, sample, results, props)
        for r in results:
            parity.add(
                SelectionRecord(
                    int(ref_ids[i]), r.sentence, r.pure_index, r.final_index,
                    r.pure_iou, r.final_iou,
                )
            )
        if images_done % 20 == 0:
            rate = images_done / (time.time() - t0)
            print(
                f"[{i + 1}/{n}] {rate:.2f} img/s | "
                f"pure oIoU {100 * float(state.pure.cum_i) / max(float(state.pure.cum_u), 1):.2f} | "
                f"final oIoU {100 * float(state.final.cum_i) / max(float(state.final.cum_u), 1):.2f}",
                flush=True,
            )
            progress.save(i, state)

    trace_ctx.__exit__(None, None, None)
    if args.profile and pipe.timer is not None:
        print(pipe.timer.summary())
    _finish(args, cfg, state, parity, t0, images_done)


def _save_result_overlays(log_dir, index, sample, results, props):
    """--show_results: write the selected-mask overlays (reference's
    result visualisation intent; demo.py:211-220 style)."""
    import os

    import numpy as np

    from ..eval.viz import save_overlay

    out_dir = os.path.join(log_dir, "results_viz")
    os.makedirs(out_dir, exist_ok=True)
    img = np.asarray(sample.image_canonical)[: sample.h, : sample.w]
    masks = np.asarray(props.masks)
    gt = (
        np.asarray(sample.gt_mask)[: sample.h, : sample.w]
        if sample.gt_mask is not None
        else None
    )
    for si, r in enumerate(results):
        if r.final_index < 0:
            continue
        m = masks[r.final_index][: sample.h, : sample.w]
        save_overlay(
            os.path.join(out_dir, f"{index:06d}_{si}.jpg"), img, m, gt_mask=gt
        )


def _finish(args, cfg, state, parity, t0, images_done):
    write_result_log(
        args.log_dir, args.dataset, args.split, args.splitBy, args.fusion_mode,
        state.pure, state.final,
    )
    if args.parity_log:
        parity.save(args.parity_log)
    dt = time.time() - t0
    print(f"done: {images_done} images in {dt:.1f}s ({images_done / max(dt, 1e-9):.2f} img/s)")


def _run_data_parallel(args, cfg, pipe, sample_iter, ref_ids, start, n, state, parity, t0):
    """Sharded eval over all local devices (parallel/full_eval.py).

    With ``compat.k_clamp_sticky`` (the parity default) the step returns
    per-image scoring ingredients and the sticky k1/k2 selection is
    replayed host-side in dataset order — results are identical to the
    sequential driver (see tests/test_full_eval.py)."""
    import itertools

    import jax
    import numpy as np

    from ..eval.metrics import IoUAccum
    from ..parallel.full_eval import (
        build_full_eval_step,
        finalize_sticky,
        place_batch,
        prepare_records,
    )
    from ..parallel.mesh import make_mesh

    D = len(jax.devices())
    mesh = make_mesh(D)
    sticky = cfg.compat.k_clamp_sticky
    step = build_full_eval_step(cfg, mesh, sticky=sticky)
    done = 0
    idx = start
    it = iter(sample_iter)
    while True:
        chunk = list(itertools.islice(it, D))
        if not chunk:
            break
        real = len(chunk)
        while len(chunk) < D:  # pad the tail chunk with inert copies
            chunk.append(chunk[-1]._replace(sentences=[]))
        # sentence bucket: power-of-two >= the chunk's true max (min 4) —
        # nothing truncated (refs can carry 5+ sentences; a fixed cap
        # would silently diverge from the sequential driver) while jit
        # specialisations stay bounded to a few bucket sizes
        from ..utils.buckets import next_pow2

        ms = max((len(c.sentences) for c in chunk), default=1) or 1
        bucket = next_pow2(ms, base=4)
        batch = prepare_records(
            chunk, pipe.parser, cfg, tokenizer=pipe.tokenizer, max_sentences=bucket
        )
        if sticky:
            ings = step(pipe.sam_params, pipe.clip_params, place_batch(batch, mesh))
            pa, fa, pidx, fidx, pious, fious, state.k1, state.k2 = finalize_sticky(
                cfg, ings, batch, state.k1, state.k2
            )
        else:
            pa, fa, pidx, fidx, pious, fious = step(
                pipe.sam_params, pipe.clip_params, place_batch(batch, mesh)
            )
        state.pure = IoUAccum(*(a + float(b) for a, b in zip(state.pure, pa)))
        state.final = IoUAccum(*(a + float(b) for a, b in zip(state.final, fa)))
        pidx = np.asarray(pidx)
        fidx = np.asarray(fidx)
        pious = np.asarray(pious)
        fious = np.asarray(fious)
        for b in range(real):
            for si, sentence in enumerate(list(chunk[b].sentences)[: pidx.shape[1]]):
                parity.add(
                    SelectionRecord(
                        int(ref_ids[idx + b]), sentence,
                        int(pidx[b, si]), int(fidx[b, si]),
                        float(pious[b, si]), float(fious[b, si]),
                    )
                )
        idx += real
        done += real
        rate = done / max(time.time() - t0, 1e-9)
        print(f"[dp {D}x] {idx}/{n} {rate:.2f} img/s", flush=True)


class _Sliced:
    def __init__(self, dataset, start, stop):
        self.dataset, self.start, self.stop = dataset, start, stop

    def __len__(self):
        return max(0, self.stop - self.start)

    def __getitem__(self, i):
        return self.dataset[self.start + i]


def cli():
    main(sys.argv[1:])


if __name__ == "__main__":
    cli()
