#!/usr/bin/env python
"""Micro-bench the decoder's three Pallas kernels at serving shapes.

Each kernel runs REPS times inside ONE jitted lax.scan (outputs chained
back into the inputs so the calls serialize) — a single dispatch + sync
read, so the ~36 ms tunnel RTT amortises away and per-call time is
(wall - RTT) / REPS. Knobs: BENCH_B (prompt batch, default 64),
HYBRIDGL_I2T_TILE (St for the i2t kernel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

REPS = 16


def main():
    import jax
    import jax.numpy as jnp

    from hybridgl_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from hybridgl_tpu.kernels.decoder_attn import i2t_ln_update
    from hybridgl_tpu.kernels.decoder_attn_t2i import t2i_ctx
    from hybridgl_tpu.kernels.upscale_hyper import upscale_hyper_blocked

    B = int(os.environ.get("BENCH_B", "64"))
    S, C, h, tp = 4096, 256, 8, 8
    GT = h * tp
    rng = np.random.default_rng(0)

    def fresh(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1, dtype)

    def timeit(name, fn, args):
        jax.block_until_ready(args)
        f = jax.jit(fn)
        float(f(*args))  # compile + warm
        walls = []
        for _ in range(3):
            t0 = time.time()
            float(f(*args))
            walls.append((time.time() - t0) * 1000)
        med = sorted(walls)[1]
        print(
            f"{name:22s} {med / REPS:7.2f} ms/call  "
            f"(walls {[round(w, 1) for w in walls]}, {REPS} calls/dispatch)"
        )

    # --- i2t_ln_update: output feeds the next call's qside/base ---
    i2t_args = (
        fresh((B, S, C)),
        fresh((B, C, GT), jnp.float32),
        jnp.zeros((B, GT), jnp.float32),
        fresh((B, GT, C), jnp.float32),
        jnp.zeros((C,), jnp.float32),
        jnp.ones((C,), jnp.float32),
        jnp.zeros((C,), jnp.float32),
        fresh((1, S, C)),
    )

    def run_i2t(x, w, off, vo, const, s, b, pe):
        def body(carry, _):
            out = i2t_ln_update(
                carry, carry, w, off, vo, const, s, b, heads=h, tp=tp, pe=pe
            )
            return out, ()
        y, _ = jax.lax.scan(body, x, None, length=REPS)
        return jnp.sum(y.astype(jnp.float32))

    timeit(f"i2t_ln_update B={B}", run_i2t, i2t_args)

    # --- t2i_ctx: fold the tiny ctx back into keys ---
    t2i_args = (fresh((B, S, C)), fresh((1, S, C)), fresh((B, C, GT), jnp.float32))

    def run_t2i(keys, pe, qw):
        def body(carry, _):
            ctx = t2i_ctx(carry, pe, qw)  # [B, GT, C] f32
            nxt = carry + (ctx[:, :1, :] * 1e-6).astype(carry.dtype)
            return nxt, ()
        y, _ = jax.lax.scan(body, keys, None, length=REPS)
        return jnp.sum(y.astype(jnp.float32))

    timeit(f"t2i_ctx B={B}", run_t2i, t2i_args)

    # --- upscale_hyper_blocked: fold a y column back into src ---
    g, c4, c8, m = 64, 64, 32, 3
    up_args = (
        fresh((B, g * g, C)),
        fresh((C, 4 * c4)),
        fresh((4 * c4,), jnp.float32),
        jnp.ones((4 * c4,), jnp.float32),
        jnp.zeros((4 * c4,), jnp.float32),
        fresh((4 * c4, 16 * c8)),
        fresh((16 * c8,), jnp.float32),
        fresh((B, 16 * c8, 16 * m)),
    )

    def run_up(src, w1, b1, ls, lb, w2bd, b2, hbd):
        def body(carry, _):
            y = upscale_hyper_blocked(carry, w1, b1, ls, lb, w2bd, b2, hbd)
            nxt = carry + (y[:, :, :1] * 1e-6).astype(carry.dtype)
            return nxt, ()
        y, _ = jax.lax.scan(body, src, None, length=REPS)
        return jnp.sum(y.astype(jnp.float32))

    timeit(f"upscale_hyper B={B}", run_up, up_args)


if __name__ == "__main__":
    main()
