#!/usr/bin/env python
"""Convert torch SAM / CLIP checkpoints to native param pytrees (one-off).

    python tools/convert_checkpoints.py --sam sam_vit_h_4b8939.pth --out-dir ckpts/
    python tools/convert_checkpoints.py --clip ViT-B-16.pt --out-dir ckpts/

Outputs ``<out-dir>/<name>.npz`` archives loadable by
``hybridgl_tpu.core.checkpoint.load`` (no torch needed at runtime).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hybridgl_tpu.core import checkpoint, convert  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sam", default="", help="path to a segment-anything .pth")
    p.add_argument("--clip", default="", help="path to an OpenAI CLIP .pt")
    p.add_argument("--out-dir", default="ckpts")
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    if args.sam:
        params, cfg = convert.load_torch_sam(args.sam)
        name = os.path.splitext(os.path.basename(args.sam))[0]
        out = os.path.join(args.out_dir, f"{name}.npz")
        checkpoint.save(out, params)
        print(f"SAM ({cfg.encoder_depth} blocks, width {cfg.encoder_width}) -> {out}")

    if args.clip:
        params, cfg = convert.load_torch_clip(args.clip)
        name = os.path.splitext(os.path.basename(args.clip))[0].replace("/", "-")
        out = os.path.join(args.out_dir, f"{name}.npz")
        checkpoint.save(out, params)
        print(f"CLIP ({cfg.vision_layers} blocks, width {cfg.vision_width}) -> {out}")

    if not args.sam and not args.clip:
        p.error("pass --sam and/or --clip")


if __name__ == "__main__":
    main()
