#!/usr/bin/env python
"""Export jitted pipeline stages as portable serialized XLA programs.

TPU-native equivalent of the reference's (unused) ONNX export path
(reference: scripts/export_onnx_model.py, utils/onnx.py): ``jax.export``
serializes the compiled stage as StableHLO so a serving system can load it
without Python model code.

    python tools/export_serving.py --out-dir exported/ [--sam vit_b]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out-dir", default="exported")
    p.add_argument("--sam", default="vit_b")
    p.add_argument("--clip", default="ViT-B/16")
    p.add_argument("--proposals", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from hybridgl_tpu.core.config import PipelineConfig
    from hybridgl_tpu.core.params import init_clip, init_sam
    from hybridgl_tpu.models.clip.fusion import hybrid_forward
    from hybridgl_tpu.models.sam.image_encoder import encode_image

    os.makedirs(args.out_dir, exist_ok=True)
    cfg = PipelineConfig(clip_model=args.clip, sam_model=args.sam)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    sam_params = init_sam(k1, cfg.sam)
    clip_params = init_clip(k2, cfg.clip)

    # 1) SAM image encoder
    def sam_encode(params, image):
        return encode_image(params["encoder"], image, cfg.sam)

    img = jnp.zeros((1, cfg.sam.img_size, cfg.sam.img_size, 3), jnp.float32)
    exp = jexport.export(jax.jit(sam_encode))(sam_params, img)
    path = os.path.join(args.out_dir, "sam_encoder.stablehlo")
    with open(path, "wb") as f:
        f.write(exp.serialize())
    print(f"sam encoder -> {path} ({os.path.getsize(path) / 1e6:.1f} MB)")

    # 2) hybrid fusion scoring forward
    P = args.proposals
    S = cfg.clip.image_size

    def fusion(params, local, glob, masks):
        return hybrid_forward(
            params["visual"], local, glob, masks, cfg.clip,
            fusion_mode=cfg.fusion_mode, masking_block=cfg.guidance.masking_block,
        )

    local = jnp.zeros((P, S, S, 3), jnp.float32)
    masks = jnp.zeros((P, S, S), jnp.float32)
    exp2 = jexport.export(jax.jit(fusion))(clip_params, local, local, masks)
    path2 = os.path.join(args.out_dir, "hybrid_fusion.stablehlo")
    with open(path2, "wb") as f:
        f.write(exp2.serialize())
    print(f"hybrid fusion -> {path2} ({os.path.getsize(path2) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
