#!/usr/bin/env python
"""A/B: SAM ViT-H encode at batch 1 vs batch N in one dispatch.

If the encoder wall is partly weight-stream / DMA-latency bound (not pure
MXU), a batched encode amortises the per-block weight staging across
images and the per-image cost drops. This decides whether the runner's
software pipeline should dispatch image PAIRS through the proposal stage.

Usage: python tools/bench_encode_batch.py [batch ...]   (default: 1 2 4)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def _force(out):
    """Force a scalar read (block_until_ready alone can return early on the
    tunneled backend when a result was served from its memo)."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    return float(abs(leaves[0]).sum())


def main():
    import jax
    import jax.numpy as jnp

    from hybridgl_tpu.core.config import PipelineConfig
    from hybridgl_tpu.core.params import cast_pytree, init_sam
    from hybridgl_tpu.models.sam.image_encoder import stack_encoder_runs
    from hybridgl_tpu.models.sam.sam import encode, preprocess_padded
    from hybridgl_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    batches = [int(a) for a in sys.argv[1:]] or [1, 2, 4]

    cfg = PipelineConfig(sam_model=os.environ.get("BENCH_SAM", "vit_h"))
    sam_cfg = cfg.sam
    params = jax.jit(
        lambda k: stack_encoder_runs(
            cast_pytree(init_sam(k, sam_cfg), jnp.bfloat16), sam_cfg
        )
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    S = sam_cfg.img_size
    rh, rw = 768, 1024

    def fresh_img():
        a = np.zeros((S, S, 3), np.uint8)
        a[:rh, :rw] = rng.integers(0, 255, (rh, rw, 3), np.uint8)
        return a

    serial = bool(os.environ.get("BENCH_SERIAL"))
    for B in batches:
        if serial:
            # same B frames, but one-at-a-time under lax.scan inside ONE
            # jit: batch-1 layouts, weights re-streamed per frame
            @jax.jit
            def enc_b(p, ims):
                x = jax.vmap(lambda im: preprocess_padded(im, (rh, rw), sam_cfg))(ims)

                def body(_, xi):
                    return None, encode(p, xi, sam_cfg)

                _, out = jax.lax.scan(body, None, x)
                return out
        else:
            @jax.jit
            def enc_b(p, ims):
                x = jax.vmap(lambda im: preprocess_padded(im, (rh, rw), sam_cfg))(ims)
                # encode() takes the preprocessed [1024,1024,3]; vmap over batch
                return jax.vmap(lambda xi: encode(p, xi, sam_cfg))(x)

        imgs = [jnp.asarray(np.stack([fresh_img() for _ in range(B)])) for _ in range(6)]
        _force(enc_b(params, imgs[0]))  # compile
        times = []
        for i in range(5):
            t0 = time.time()
            _force(enc_b(params, imgs[1 + i]))
            times.append((time.time() - t0) * 1000)
        med = sorted(times)[len(times) // 2]
        print(
            f"batch {B}: {med:7.1f} ms/call  {med / B:7.1f} ms/img   "
            f"(all: {[round(t, 1) for t in times]})"
        )


if __name__ == "__main__":
    main()
