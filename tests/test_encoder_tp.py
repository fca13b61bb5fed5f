"""Tensor-parallel SAM encoder == single-device encoder.

encode_image_tp (parallel/encoder_tp.py) shards heads/MLP-hidden across a
mesh axis with one psum per half-block; on an mp-axis virtual mesh its
replicated output must match the plain encoder up to psum summation-order
rounding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hybridgl_tpu.core.params import init_sam
from hybridgl_tpu.models.sam.image_encoder import encode_image, stack_encoder_runs
from hybridgl_tpu.parallel.encoder_tp import encode_image_tp

import sys, os

sys.path.insert(0, os.path.dirname(__file__))
from torch_ref_sam import tiny_sam_config  # noqa: E402


@pytest.mark.parametrize("mp", [2, 4])
def test_encoder_tp_matches_single_device(rng, mp):
    cfg = tiny_sam_config()
    if cfg.encoder_heads % mp:
        import dataclasses

        cfg = dataclasses.replace(cfg, encoder_heads=mp)
    params = stack_encoder_runs({"encoder": init_sam(jax.random.PRNGKey(0), cfg)["encoder"]}, cfg)
    enc = params["encoder"]
    img = jnp.asarray(rng.standard_normal((1, cfg.img_size, cfg.img_size, 3)), jnp.float32)

    want = np.asarray(encode_image(enc, img, cfg))

    devices = np.array(jax.devices()[:mp])
    mesh = Mesh(devices, ("mp",))
    from hybridgl_tpu.parallel.mesh import shard_map_compat

    step = shard_map_compat(
        lambda p, x: encode_image_tp(p, x, cfg, axis="mp"),
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
    )
    got = np.asarray(jax.jit(step)(enc, img))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
