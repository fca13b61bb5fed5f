"""Oracle tests: antialiased resize vs torch F.interpolate(antialias=True).

The reference resizes the GEM heatmap to the image size with torchvision
``T.Resize((h, w), antialias=True)`` (reference: Hybridgl_main.py:201),
whose tensor path is exactly ``F.interpolate(mode='bilinear',
align_corners=False, antialias=True)``. Antialiasing is a triangle filter
that only differs from plain bilinear when DOWNsampling — which happens for
every image with a side smaller than the 448-px GEM frame (e.g. the common
640x427 COCO images).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hybridgl_tpu.kernels.resize import (
    place_valid_region_antialias,
    resize_antialias,
    resize_bilinear,
)

torch = pytest.importorskip("torch")


def torch_resize(x: np.ndarray, oh: int, ow: int, antialias: bool) -> np.ndarray:
    import torch.nn.functional as F

    t = torch.from_numpy(x)[None, None]
    out = F.interpolate(
        t, size=(oh, ow), mode="bilinear", align_corners=False, antialias=antialias
    )
    return out[0, 0].numpy()


SCALES = [
    (448, 448, 427, 640),  # mixed: down in h, up in w (640x427 COCO image)
    (448, 448, 224, 224),  # 2x down
    (448, 448, 300, 200),  # non-integer down
    (100, 80, 33, 27),  # ~3x down
    (448, 448, 500, 640),  # pure up (must equal plain bilinear)
    (50, 40, 75, 90),  # pure up, non-integer
    (448, 448, 448, 448),  # identity
    (64, 64, 63, 65),  # near-identity mixed
]


@pytest.mark.parametrize("ih,iw,oh,ow", SCALES)
def test_resize_antialias_matches_torch(rng, ih, iw, oh, ow):
    x = rng.random((ih, iw), np.float32)
    want = torch_resize(x, oh, ow, antialias=True)
    got = np.asarray(resize_antialias(jnp.asarray(x), (oh, ow)))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


def test_antialias_equals_bilinear_on_upsample(rng):
    x = rng.random((56, 56), np.float32)
    aa = np.asarray(resize_antialias(jnp.asarray(x), (112, 160)))
    plain = np.asarray(resize_bilinear(jnp.asarray(x), (112, 160)))
    np.testing.assert_allclose(aa, plain, atol=2e-6, rtol=1e-5)


def test_antialias_differs_from_bilinear_on_downsample(rng):
    x = rng.random((448, 448), np.float32)
    aa = np.asarray(resize_antialias(jnp.asarray(x), (100, 100)))
    plain = np.asarray(resize_bilinear(jnp.asarray(x), (100, 100)))
    assert np.abs(aa - plain).max() > 1e-3  # the filter genuinely widens


def test_place_valid_region_antialias_traced(rng):
    """The traced-extent variant under jit matches torch per (h, w)."""
    x = rng.random((448, 448), np.float32)
    C = 640

    @jax.jit
    def run(img, h, w):
        return place_valid_region_antialias(img, (C, C), (h, w))

    for h, w in [(427, 640), (480, 640), (333, 500), (640, 426)]:
        out = np.asarray(run(jnp.asarray(x), h, w))
        want = torch_resize(x, h, w, antialias=True)
        np.testing.assert_allclose(out[:h, :w], want, atol=2e-6, rtol=1e-5)
        assert not out[h:, :].any() and not out[:, w:].any()


def test_resize_antialias_channels(rng):
    x = rng.random((64, 64, 3), np.float32)
    got = np.asarray(resize_antialias(jnp.asarray(x), (30, 40)))
    for c in range(3):
        want = torch_resize(x[..., c], 30, 40, antialias=True)
        np.testing.assert_allclose(got[..., c], want, atol=2e-6, rtol=1e-5)
