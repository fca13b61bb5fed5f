"""SamPredictor-style convenience API.

A thin stateful wrapper over the functional SAM modules with the same
usage pattern as the reference's predictor
(reference: third_party/segment-anything/segment_anything/predictor.py):
``set_image`` once (caches the embedding), then cheap repeated ``predict``
calls with point/box prompts. Everything after ``set_image`` is a single
jitted dispatch per call.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.config import SamConfig
from ...kernels.resize import place_valid_region
from .decoder import predict_masks
from .image_encoder import encode_image
from .prompt_encoder import dense_pe, embed_boxes, embed_points, no_mask_dense
from .sam import get_preprocess_shape, preprocess_padded


class SamPredictor:
    def __init__(self, params, cfg: SamConfig):
        self.params = params
        self.cfg = cfg
        self._features: Optional[jax.Array] = None
        self._orig_hw: Optional[Tuple[int, int]] = None
        self._input_hw: Optional[Tuple[int, int]] = None

        @jax.jit
        def _encode(p, frame, rh, rw):
            x = preprocess_padded(frame, (rh, rw), cfg)
            return encode_image(p["encoder"], x[None], cfg)[0]

        @partial(jax.jit, static_argnames=("multimask", "with_box"))
        def _predict(p, features, coords, labels, boxes, rh, rw, h, w, multimask, with_box):
            sparse = embed_points(p["prompt"], coords, labels, cfg, pad=not with_box)
            if with_box:
                be = embed_boxes(p["prompt"], boxes, cfg)
                sparse = jnp.concatenate([sparse, be], axis=1)
            # un-batched no-mask dense -> shared-image decoder fast path
            dense = no_mask_dense(p["prompt"], cfg, 1)[0]
            pe = dense_pe(p["prompt"], cfg)
            low_res, iou = predict_masks(
                p["decoder"], features, pe, sparse, cfg,
                dense_prompts=dense, multimask_output=multimask,
            )
            return low_res, iou

        self._encode = _encode
        self._predict_jit = _predict

    # ------------------------------------------------------------------ API
    def set_image(self, image: np.ndarray) -> None:
        """image: [h, w, 3] uint8 RGB. Long-side-resizes + encodes once."""
        from PIL import Image

        h, w = image.shape[:2]
        rh, rw = get_preprocess_shape(h, w, self.cfg.img_size)
        resized = np.asarray(Image.fromarray(image).resize((rw, rh), Image.BILINEAR))
        frame = np.zeros((self.cfg.img_size, self.cfg.img_size, 3), np.uint8)
        frame[:rh, :rw] = resized
        self._features = self._encode(self.params, jnp.asarray(frame), rh, rw)
        self._orig_hw = (h, w)
        self._input_hw = (rh, rw)

    @property
    def is_image_set(self) -> bool:
        return self._features is not None

    def get_image_embedding(self) -> jax.Array:
        assert self.is_image_set, "call set_image first"
        return self._features

    def reset_image(self) -> None:
        self._features = None
        self._orig_hw = None
        self._input_hw = None

    def predict(
        self,
        point_coords: Optional[np.ndarray] = None,  # [N, 2] original-res xy
        point_labels: Optional[np.ndarray] = None,  # [N]
        box: Optional[np.ndarray] = None,  # [4] xyxy original-res
        multimask_output: bool = True,
        return_logits: bool = False,
    ):
        """Returns (masks [M, h, w], iou [M], low_res [M, 256, 256])."""
        assert self.is_image_set, "call set_image first"
        h, w = self._orig_hw
        rh, rw = self._input_hw
        sx, sy = rw / w, rh / h
        if point_coords is not None:
            coords = np.asarray(point_coords, np.float32) * [sx, sy]
            coords = jnp.asarray(coords[None])
            labels = jnp.asarray(np.asarray(point_labels, np.float32)[None])
        else:
            coords = jnp.zeros((1, 0, 2), jnp.float32)
            labels = jnp.zeros((1, 0), jnp.float32)
        with_box = box is not None
        boxes = (
            jnp.asarray((np.asarray(box, np.float32) * [sx, sy, sx, sy])[None])
            if with_box
            else jnp.zeros((1, 4), jnp.float32)
        )
        low_res, iou = self._predict_jit(
            self.params, self._features, coords, labels, boxes,
            rh, rw, h, w, multimask_output, with_box,
        )
        low_res = low_res[0]
        # postprocess to original size (reference: sam.py:133-162)
        from .sam import upscale_logits_to_input_frame

        up = upscale_logits_to_input_frame(low_res, self.cfg)
        out = jax.vmap(
            lambda m: place_valid_region(m, (rh, rw), (h, w), (h, w))
        )(up)
        masks = out if return_logits else out > self.cfg.mask_threshold
        return np.asarray(masks), np.asarray(iou[0]), np.asarray(low_res)
