"""CLIP image preprocessing (host-side, PIL).

Equivalent of the reference's ``_transform``
(reference: third_party/modified_CLIP/clip/clip.py:79-86): bicubic resize
of the short side to the model resolution, center crop, RGB [0,1]
normalize with the CLIP statistics. The device pipeline builds its crops
on-device (pipeline/preprocess.py); this host helper completes the
standalone CLIP API for users encoding arbitrary images.
"""

from __future__ import annotations

import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_image_preprocess(image: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 [H, W, 3] RGB -> float32 [size, size, 3] normalized (NHWC)."""
    from PIL import Image

    pil = Image.fromarray(image)
    w, h = pil.size
    short = min(w, h)
    nw, nh = round(w * size / short), round(h * size / short)
    pil = pil.resize((nw, nh), Image.BICUBIC)
    left = (nw - size) // 2
    top = (nh - size) // 2
    pil = pil.crop((left, top, left + size, top + size))
    x = np.asarray(pil, np.float32) / 255.0
    return (x - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)
