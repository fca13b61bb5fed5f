#!/usr/bin/env python
"""Isolated probe of the encoder block's LN+MLP+residual tail.

The windowed-block trace attributes 22.6 ms/28 blocks to the MLP fusion
(bf16[1,64,64,1280] output) vs ~15.3 ms matmul SOL. This times the tail
alone in several formulations to find where the 30% goes:
  nhwc    — exactly as encoder_block composes it today
  flat    — tokens reshaped [4096, 1280] before the matmuls
  nogelu  — exact-gelu replaced by identity (bounds the VPU transcendental)
  noln    — LN replaced by identity (bounds the f32 normalisation)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hybridgl_tpu.models.sam.image_encoder import _ln, _mlp


def main():
    from hybridgl_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    depth, D, mlp_h = 28, 1280, 5120
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)

    def nrm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(jnp.bfloat16)

    p = {
        "ln_2": {
            "scale": jnp.ones((depth, D), jnp.float32),
            "bias": jnp.zeros((depth, D), jnp.float32),
        },
        "mlp_fc": {"w": nrm(ks[0], (depth, D, mlp_h)), "b": nrm(ks[1], (depth, mlp_h))},
        "mlp_proj": {"w": nrm(ks[2], (depth, mlp_h, D)), "b": nrm(ks[3], (depth, D))},
    }

    def tail(bp, x, *, flat=False, gelu=True, ln=True):
        shp = x.shape
        if flat:
            x = x.reshape(-1, D)
        h = _ln(bp["ln_2"], x) if ln else x
        if gelu:
            h = _mlp(bp, h)
        else:
            h = h @ bp["mlp_fc"]["w"].astype(h.dtype) + bp["mlp_fc"]["b"].astype(h.dtype)
            h = h @ bp["mlp_proj"]["w"].astype(h.dtype) + bp["mlp_proj"]["b"].astype(h.dtype)
        return (x + h).reshape(shp)

    variants = {
        "nhwc": dict(),
        "flat": dict(flat=True),
        "nogelu": dict(gelu=False),
        "noln": dict(ln=False),
    }
    xs = [
        jax.random.normal(jax.random.PRNGKey(i + 1), (1, 64, 64, D), jnp.float32).astype(jnp.bfloat16)
        for i in range(6)
    ]
    for name, kw in variants.items():
        def make(kw):
            def run(p, x):
                def body(h, bp):
                    return tail(bp, h, **kw), None

                out, _ = jax.lax.scan(body, x, p)
                return out

            return jax.jit(run)

        fn = make(kw)
        float(fn(p, xs[0]).sum())
        times = []
        for i in range(5):
            t0 = time.time()
            float(fn(p, xs[i + 1]).sum())
            times.append((time.time() - t0) * 1000)
        med = sorted(times)[2]
        print(
            f"{name:7s} median {med:7.1f} ms/28 = {med / depth:5.2f} ms/block | "
            + " ".join(f"{t:.0f}" for t in times),
            flush=True,
        )


if __name__ == "__main__":
    main()
