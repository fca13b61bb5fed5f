#!/usr/bin/env python
"""Chained-in-jit wall for the CLIP hybrid fusion forward (feature stage).

REPS sequential hybrid_forward calls inside ONE jit (outputs folded back
into the inputs) — one dispatch + one sync read, so the tunnel RTT
amortises and (wall - RTT) / REPS approximates the per-call device wall.

Knobs: BENCH_P (proposal bucket, default 64), BENCH_MODE (fusion mode).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

REPS = 8


def main():
    import jax
    import jax.numpy as jnp

    from hybridgl_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from hybridgl_tpu.core.config import PipelineConfig
    from hybridgl_tpu.core.params import cast_pytree, init_clip
    from hybridgl_tpu.models.clip.fusion import hybrid_forward
    from hybridgl_tpu.pipeline.runner import _stack_clip_params

    mode = os.environ.get("BENCH_MODE", "G2L")
    P = int(os.environ.get("BENCH_P", "64"))
    cfg = PipelineConfig(fusion_mode=mode)
    clip_cfg = cfg.clip
    params = jax.jit(
        lambda k: _stack_clip_params(cast_pytree(init_clip(k, clip_cfg), jnp.bfloat16))
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    local = jnp.asarray(rng.standard_normal((P, 224, 224, 3)).astype(np.float32))
    glob = jnp.asarray(rng.standard_normal((P, 224, 224, 3)).astype(np.float32))
    masks = jnp.asarray((rng.random((P, 224, 224)) > 0.5).astype(np.float32))

    @jax.jit
    def run(p, local, glob, masks):
        def body(carry, _):
            l, g = carry
            feats = hybrid_forward(
                p["visual"], l, g, masks, clip_cfg,
                fusion_mode=mode, masking_block=cfg.guidance.masking_block,
                compat=cfg.compat, masks_hw=(224, 224),
            )
            f = feats[0] if isinstance(feats, tuple) else feats
            bump = (jnp.sum(f.astype(jnp.float32)) * 1e-12).astype(l.dtype)
            return (l + bump, g + bump), ()
        (l, g), _ = jax.lax.scan(body, (local, glob), None, length=REPS)
        return jnp.sum(l.astype(jnp.float32))

    args = (params, local, glob, masks)
    jax.block_until_ready(args)
    float(run(*args))  # compile
    trace_dir = os.environ.get("BENCH_TRACE", "")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        float(run(*args))
        jax.profiler.stop_trace()
        print(f"trace -> {trace_dir} (parse with --calls {REPS})")
    walls = []
    for _ in range(3):
        t0 = time.time()
        float(run(*args))
        walls.append((time.time() - t0) * 1000)
    med = sorted(walls)[1]
    print(
        f"hybrid_forward {mode} P={P}: {med / REPS:7.2f} ms/call "
        f"(walls {[round(w, 1) for w in walls]}, {REPS} calls/dispatch)"
    )


if __name__ == "__main__":
    main()
