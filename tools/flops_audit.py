#!/usr/bin/env python
"""Cross-check the analytic FLOPs model against XLA's own cost analysis.

The bench's MFU fields lean entirely on ``hybridgl_tpu/utils/flops.py``;
this tool grounds that model by compiling each pipeline stage exactly as
the production path runs it (stacked/prepared params) and comparing the
model's per-stage FLOPs against ``compiled.cost_analysis()["flops"]``
(VERDICT r4 #2).

Pallas custom calls are invisible to XLA's cost model, so every kernel is
forced onto its pure-XLA fallback before anything traces — same math,
same matmul shapes, countable ops. The analytic model counts matmul/conv
FLOPs only; XLA additionally counts elementwise work, so the XLA number
is expected to sit a few percent ABOVE the model. A per-stage relative
error beyond ``--tol`` (default 10%) fails the audit.

Runs on any backend (CPU included — the test tier uses a small geometry;
the default ViT-H geometry is the bench configuration).

Usage:
  python tools/flops_audit.py [--sam vit_h] [--clip ViT-B/16] [--tol 0.1]
  JAX_PLATFORMS=cpu python tools/flops_audit.py --sam vit_b --small
"""

import argparse
import contextlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Pallas kernels lower to custom calls whose FLOPs XLA cannot see; the
# audit forces the XLA fallback paths (the flags are read at trace time).
PALLAS_OPT_OUTS = (
    "HYBRIDGL_FLASH",
    "HYBRIDGL_FLASH_WINDOWED",
    "HYBRIDGL_FUSED_CLIP",
    "HYBRIDGL_FUSED_I2T",
    "HYBRIDGL_FUSED_T2I",
    "HYBRIDGL_FUSED_PASS",
    "HYBRIDGL_FUSED_UPSCALE",
)


@contextlib.contextmanager
def xla_fallbacks():
    """Temporarily force every Pallas kernel onto its XLA fallback."""
    saved = {f: os.environ.get(f) for f in PALLAS_OPT_OUTS}
    saved["HYBRIDGL_ENC_UNROLL"] = os.environ.get("HYBRIDGL_ENC_UNROLL")
    try:
        for f in PALLAS_OPT_OUTS:
            os.environ[f] = "0"
        yield
    finally:
        for f, v in saved.items():
            if v is None:
                os.environ.pop(f, None)
            else:
                os.environ[f] = v


def xla_flops(fn, *args) -> float:
    import jax

    co = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(co, list):  # older backends returned one dict per device
        co = co[0]
    return float(co["flops"])


def run_audit(cfg, tol: float, n_proposals: int | None = None, verbose=True):
    """Audit every stage of the FLOPs model; returns list of result dicts."""
    with xla_fallbacks():
        return _run_audit(cfg, tol, n_proposals, verbose)


def _run_audit(cfg, tol: float, n_proposals: int | None, verbose):
    import jax
    import jax.numpy as jnp

    from hybridgl_tpu.core.params import init_clip, init_sam
    from hybridgl_tpu.models.clip.fusion import hybrid_forward
    from hybridgl_tpu.models.clip.text import encode_text
    from hybridgl_tpu.models.gem.gem import gem_image_features
    from hybridgl_tpu.models.sam.image_encoder import encode_image
    from hybridgl_tpu.models.sam.sam import predict_points
    from hybridgl_tpu.utils import flops as F

    sam_cfg, clip_cfg = cfg.sam, cfg.clip
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    # LIST-format (unstacked) params: the production scan-stacked layout
    # hides the layer loop inside lax.scan, whose body XLA's cost analysis
    # counts ONCE instead of x trip-count (measured: the text stage came
    # back exactly 1/n_layers of the true count). The unstacked path runs
    # the same per-layer matmul shapes unrolled, so every layer is counted.
    sam_params = jax.jit(lambda k: init_sam(k, sam_cfg))(k1)
    clip_params = jax.jit(lambda k: init_clip(k, clip_cfg))(k2)

    S = sam_cfg.img_size
    B = cfg.amg.points_per_batch
    N = n_proposals if n_proposals is not None else cfg.amg.max_proposals
    Csz = cfg.crop_size

    results = []

    def check(stage, model_fl, fn, *args, xla_adjust=0.0):
        xla = xla_flops(fn, *args) - xla_adjust
        rel = (xla - model_fl) / model_fl if model_fl else float("inf")
        results.append(
            {
                "stage": stage,
                "model_gf": round(model_fl / 1e9, 3),
                "xla_gf": round(xla / 1e9, 3),
                "rel_err": round(rel, 4),
                "ok": abs(rel) <= tol,
            }
        )
        if verbose:
            mark = "PASS" if results[-1]["ok"] else "FAIL"
            print(
                f"{mark} {stage:12s} model {model_fl / 1e9:10.2f} GF   "
                f"xla {xla / 1e9:10.2f} GF   rel {rel:+.2%}",
                file=sys.stderr,
            )

    # XLA's cost model prices exact-erf gelu at ~64 flops/element (measured
    # below, not hardcoded) — pure cost-model expansion of the transcendental,
    # not matmul work. The decode tail runs two gelus over wide activation
    # maps where this would read as a ~10% phantom gap, so the audit
    # calibrates the per-element cost once and subtracts it there.
    probe_n = 1 << 20
    gelu_per_elt = xla_flops(
        lambda t: jax.nn.gelu(t, approximate=False), jnp.zeros((probe_n,))
    ) / probe_n

    # ---- SAM encoder: one preprocessed frame -> embedding -----------------
    # windowed runs execute under lax.scan even in list format; unrolling by
    # the run length puts every block's ops in the counted body
    from hybridgl_tpu.models.sam.image_encoder import window_runs

    run_len = max(
        (len(idxs) for kind, idxs in window_runs(sam_cfg) if kind != "global"),
        default=1,
    )
    os.environ["HYBRIDGL_ENC_UNROLL"] = str(run_len)
    x = jnp.zeros((1, S, S, 3), jnp.float32)
    check(
        "sam_encoder",
        F.sam_encoder_flops(sam_cfg),
        lambda p, xx: encode_image(p["encoder"], xx, sam_cfg),
        sam_params,
        x,
    )
    os.environ["HYBRIDGL_ENC_UNROLL"] = "1"

    # ---- SAM decode: one points_per_batch chunk, multimask ----------------
    # audited against the EXECUTED-flops model (side-switched attentions,
    # shared layer-0): the canonical sam_decode_flops counts the reference
    # architecture's work for MFU and is ~45% higher by design — the audit
    # records the ratio for visibility.
    emb = jnp.zeros((sam_cfg.embed_grid, sam_cfg.embed_grid, sam_cfg.prompt_dim))
    coords = jnp.full((B, 1, 2), S / 2.0, jnp.float32)
    labels = jnp.ones((B, 1), jnp.float32)
    Ti = sam_cfg.embed_grid**2
    D = sam_cfg.prompt_dim
    gelu_elts = B * (Ti * D + Ti * 4 * (D // 2))  # z1 + z2 activation maps
    check(
        "sam_decode",
        F.sam_decode_flops_executed(sam_cfg, B),
        lambda p, e, c, l: predict_points(p, e, c, l, sam_cfg, True),
        sam_params,
        emb,
        coords,
        labels,
        xla_adjust=gelu_per_elt * gelu_elts,
    )
    results[-1]["canonical_gf"] = round(F.sam_decode_flops(sam_cfg, B) / 1e9, 3)
    results[-1]["gelu_adjust_gf"] = round(gelu_per_elt * gelu_elts / 1e9, 3)

    # ---- CLIP hybrid fusion over N proposals ------------------------------
    local = jnp.zeros((N, Csz, Csz, 3), jnp.float32)
    glob = jnp.zeros((N, Csz, Csz, 3), jnp.float32)
    masks = jnp.zeros((N, cfg.canonical_size, cfg.canonical_size), jnp.float32)
    check(
        "clip_fusion",
        F.clip_fusion_flops(cfg, N),
        lambda p, lo, gl, m: hybrid_forward(
            p["visual"],
            lo,
            gl,
            m,
            clip_cfg,
            fusion_mode=cfg.fusion_mode,
            masking_block=cfg.guidance.masking_block,
            compat=cfg.compat,
            masks_hw=(cfg.canonical_size, cfg.canonical_size),
        ),
        clip_params,
        local,
        glob,
        masks,
    )

    # ---- GEM image features ------------------------------------------------
    gimg = jnp.zeros((1, cfg.gem.img_size, cfg.gem.img_size, 3), jnp.float32)
    check(
        "gem",
        F.gem_flops(cfg),
        lambda p, g: gem_image_features(p["visual"], g, clip_cfg, cfg.gem),
        clip_params,
        gimg,
    )

    # ---- text encoding (sentence + noun phrase + 1 negative) --------------
    n_streams = 3
    toks = jnp.zeros((n_streams, clip_cfg.context_length), jnp.int32)
    check(
        "text",
        F.text_flops(cfg, n_streams),
        lambda p, t: encode_text(p["text"], t, clip_cfg),
        clip_params,
        toks,
    )

    return results


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sam", default="vit_h")
    ap.add_argument("--fusion", default="G2L")
    ap.add_argument("--tol", type=float, default=0.10)
    ap.add_argument(
        "--proposals", type=int, default=None, help="fusion batch (default: bucket P)"
    )
    args = ap.parse_args()

    from hybridgl_tpu.core.config import PipelineConfig
    from hybridgl_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = PipelineConfig(sam_model=args.sam, fusion_mode=args.fusion)
    results = run_audit(cfg, args.tol, n_proposals=args.proposals)
    ok = all(r["ok"] for r in results)
    print(json.dumps({"audit_ok": ok, "tol": args.tol, "stages": results}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
