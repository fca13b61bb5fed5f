"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hybridgl_tpu.core.config import AmgConfig, GemConfig, PipelineConfig
from hybridgl_tpu.core.params import init_clip, init_sam
from hybridgl_tpu.parallel.mesh import (
    EvalBatch,
    build_sharded_eval_step,
    make_mesh,
    make_mesh_2d,
    shard_batch,
)

from torch_ref import tiny_clip_config
from torch_ref_sam import tiny_sam_config

pytestmark = pytest.mark.slow  # whole-pipeline / mesh tests, ~30-70s each


@pytest.fixture(scope="module")
def tiny_cfg():
    clip_cfg = tiny_clip_config()
    sam_cfg = tiny_sam_config()
    return PipelineConfig(
        clip_config=clip_cfg,
        sam_config=sam_cfg,
        fusion_mode="G2L",
        canonical_size=32,
        crop_size=clip_cfg.image_size,
        amg=AmgConfig(
            points_per_side=2,
            points_per_batch=4,
            pred_iou_thresh=0.0,
            stability_score_thresh=0.0,
            max_proposals=4,
        ),
        gem=GemConfig(img_size=32, depth=1),
    ).replace(
        guidance=PipelineConfig().guidance.__class__(
            masking_block=clip_cfg.vision_layers - 2
        )
    )


def make_batch(rng, cfg, B):
    S = cfg.sam.img_size
    C = cfg.canonical_size
    L = cfg.clip.context_length
    toks = np.zeros((B, L), np.int32)
    toks[:, 0] = cfg.clip.vocab_size - 2
    toks[:, 1] = 5
    toks[:, 2] = cfg.clip.vocab_size - 1
    return EvalBatch(
        image_1024=rng.integers(0, 255, (B, S, S, 3)).astype(np.uint8),
        rh=np.full(B, S, np.int32),
        rw=np.full(B, S, np.int32),
        image_canonical=rng.integers(0, 255, (B, C, C, 3)).astype(np.uint8),
        h=np.full(B, C, np.int32),
        w=np.full(B, C, np.int32),
        gt_mask=(rng.random((B, C, C)) > 0.5),
        tokens_sentence=toks,
        tokens_np=toks.copy(),
    )


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_eval_step(tiny_cfg):
    mesh = make_mesh(8)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    sam_params = init_sam(k1, tiny_cfg.sam)
    clip_params = init_clip(k2, tiny_cfg.clip)
    step = build_sharded_eval_step(tiny_cfg, mesh)
    rng = np.random.default_rng(0)
    batch = shard_batch(make_batch(rng, tiny_cfg, 8), mesh)
    acc, sels = step(sam_params, clip_params, batch)
    assert int(acc.count) == 8  # one update per image, psum'd
    assert sels.shape == (8,)
    assert float(acc.cum_u) >= float(acc.cum_i) >= 0.0


def test_sharded_matches_single_device(tiny_cfg):
    """The dp-sharded step must produce identical accumulators to running
    the same batch on one device."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    sam_params = init_sam(k1, tiny_cfg.sam)
    clip_params = init_clip(k2, tiny_cfg.clip)
    rng = np.random.default_rng(1)
    batch = make_batch(rng, tiny_cfg, 8)

    mesh8 = make_mesh(8)
    step8 = build_sharded_eval_step(tiny_cfg, mesh8)
    acc8, sels8 = step8(sam_params, clip_params, shard_batch(batch, mesh8))

    mesh1 = make_mesh(1)
    step1 = build_sharded_eval_step(tiny_cfg, mesh1)
    acc1, sels1 = step1(sam_params, clip_params, shard_batch(batch, mesh1))

    np.testing.assert_allclose(float(acc8.cum_i), float(acc1.cum_i), rtol=1e-5)
    np.testing.assert_allclose(float(acc8.cum_u), float(acc1.cum_u), rtol=1e-5)
    np.testing.assert_allclose(float(acc8.sum_iou), float(acc1.sum_iou), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(sels8), np.asarray(sels1))


def test_2d_mesh_dp_mp_matches_1d(tiny_cfg):
    """(dp, mp) proposal-axis sharding must reproduce the 1D dp result."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    sam_params = init_sam(k1, tiny_cfg.sam)
    clip_params = init_clip(k2, tiny_cfg.clip)
    rng = np.random.default_rng(3)
    batch = make_batch(rng, tiny_cfg, 4)

    mesh1 = make_mesh(4)
    step1 = build_sharded_eval_step(tiny_cfg, mesh1)
    acc1, sels1 = step1(sam_params, clip_params, shard_batch(batch, mesh1))

    mesh2 = make_mesh_2d(8, mp=2)  # dp=4 x mp=2
    step2 = build_sharded_eval_step(tiny_cfg, mesh2, mp_axis="mp")
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh2, P("dp"))
    batch2 = EvalBatch(*(jax.device_put(np.asarray(x), sharding) for x in batch))
    acc2, sels2 = step2(sam_params, clip_params, batch2)

    np.testing.assert_allclose(float(acc2.cum_i), float(acc1.cum_i), rtol=1e-5)
    np.testing.assert_allclose(float(acc2.cum_u), float(acc1.cum_u), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(sels2), np.asarray(sels1))
