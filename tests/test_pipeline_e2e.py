"""End-to-end pipeline smoke test on tiny random models (CPU).

Checks that the whole device pipeline (proposals -> crops -> fusion ->
text -> GEM -> guidance -> selection -> IoU) runs under jit with static
shapes, produces sane outputs, and that metric accumulation matches the
per-sentence IoUs.
"""

import numpy as np
import pytest

import jax

from hybridgl_tpu.core.config import AmgConfig, GemConfig, PipelineConfig
from hybridgl_tpu.core.params import init_clip, init_sam
from hybridgl_tpu.lang import HeuristicParser
from hybridgl_tpu.pipeline.runner import HybridGLPipeline, ImageSample

from torch_ref import tiny_clip_config
from torch_ref_sam import tiny_sam_config


class FakeTokenizer:
    """Deterministic stand-in so the suite runs without the BPE vocab."""

    sot_token = 99
    eot_token = 100

    def encode(self, text):
        return [(hash(w) % 97) + 1 for w in text.split()][:40]


@pytest.fixture(scope="module")
def pipeline():
    clip_cfg = tiny_clip_config()
    sam_cfg = tiny_sam_config()
    cfg = PipelineConfig(
        clip_config=clip_cfg,
        sam_config=sam_cfg,
        fusion_mode="G2L",
        canonical_size=32,
        crop_size=clip_cfg.image_size,
        amg=AmgConfig(
            points_per_side=4,
            points_per_batch=8,
            pred_iou_thresh=0.0,
            stability_score_thresh=0.0,
            max_proposals=8,
        ),
        gem=GemConfig(img_size=32, depth=2),
    )
    # masking_block analogue for the 3-block tiny CLIP
    cfg = cfg.replace(
        guidance=cfg.guidance.__class__(masking_block=clip_cfg.vision_layers - 2)
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    clip_params = init_clip(keys[0], clip_cfg)
    sam_params = init_sam(keys[1], sam_cfg)
    # tiny random SAM needs nonzero rel-pos etc; leave zeros (valid path)
    return HybridGLPipeline(
        cfg,
        sam_params,
        clip_params,
        parser=HeuristicParser(),
        tokenizer=FakeTokenizer(),
    )


def make_sample(rng, sam_cfg, canonical=32, h=24, w=32):
    img1024 = np.zeros((sam_cfg.img_size, sam_cfg.img_size, 3), np.uint8)
    rh, rw = sam_cfg.img_size * h // max(h, w), sam_cfg.img_size * w // max(h, w)
    img1024[:rh, :rw] = rng.integers(0, 255, (rh, rw, 3), np.uint8)
    imgc = np.zeros((canonical, canonical, 3), np.uint8)
    imgc[:h, :w] = rng.integers(0, 255, (h, w, 3), np.uint8)
    gt = np.zeros((canonical, canonical), bool)
    gt[4:16, 6:20] = True
    return ImageSample(
        image_1024=img1024,
        rh=rh,
        rw=rw,
        image_canonical=imgc,
        h=h,
        w=w,
        gt_mask=gt,
        sentences=["the red cup on the left", "dog under the table"],
    )


@pytest.mark.slow
def test_pipeline_runs_and_accumulates(pipeline):
    rng = np.random.default_rng(0)
    state = pipeline.init_state()
    sample = make_sample(rng, pipeline.cfg.sam)
    from hybridgl_tpu.pipeline.runner import materialize_results

    results = materialize_results(pipeline.run_image(sample, state))
    assert len(results) == 2
    for r in results:
        assert 0.0 <= r.pure_iou <= 1.0
        assert 0.0 <= r.final_iou <= 1.0
    assert int(state.pure.count) == 2
    assert int(state.final.count) == 2
    got = state.pure.sum_iou
    want = sum(r.pure_iou for r in results)
    assert abs(got - want) < 1e-6


def test_pipeline_sticky_k_clamp(pipeline):
    rng = np.random.default_rng(1)
    state = pipeline.init_state()
    assert state.k1 == 3 and state.k2 == 6
    sample = make_sample(rng, pipeline.cfg.sam)
    pipeline.run_image(sample, state)
    # with the tiny random model few proposals survive; sticky clamp must
    # never increase k afterwards
    k1_after = state.k1
    pipeline.run_image(make_sample(np.random.default_rng(2), pipeline.cfg.sam), state)
    assert state.k1 <= k1_after


@pytest.mark.slow
def test_pipeline_multicrop_config():
    """Runner end-to-end through the multi-crop AMG path (PhraseCut-style)."""
    import jax
    from hybridgl_tpu.core.config import AmgConfig, GemConfig, PipelineConfig
    from hybridgl_tpu.core.params import init_clip, init_sam

    clip_cfg = tiny_clip_config()
    sam_cfg = tiny_sam_config()
    cfg = PipelineConfig(
        clip_config=clip_cfg,
        sam_config=sam_cfg,
        fusion_mode="L2G",
        canonical_size=32,
        crop_size=clip_cfg.image_size,
        amg=AmgConfig(
            points_per_side=4,
            points_per_batch=8,
            pred_iou_thresh=0.0,
            stability_score_thresh=0.0,
            crop_n_layers=1,
            crop_n_points_downscale_factor=2,
            min_mask_region_area=0,
            max_proposals=8,
            max_candidates_per_crop=8,
        ),
        gem=GemConfig(img_size=32, depth=2),
    ).replace(
        guidance=PipelineConfig().guidance.__class__(
            masking_block=clip_cfg.vision_layers - 2
        )
    )
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    pipe = HybridGLPipeline(
        cfg,
        init_sam(keys[1], sam_cfg),
        init_clip(keys[0], clip_cfg),
        parser=HeuristicParser(),
        tokenizer=FakeTokenizer(),
    )
    rng = np.random.default_rng(9)
    state = pipe.init_state()
    results = pipe.run_image(make_sample(rng, sam_cfg), state)
    assert len(results) == 2
    assert int(state.final.count) == 2


def test_cleanup_host_bucketed_transfer(pipeline):
    """_cleanup_host with P > the prefetched head must fetch a bucket slice
    and rebuild FULL-shape device masks (regression: a changed mask once
    rebuilt a head-shaped [8, C, C] bundle when P was 16)."""
    import jax.numpy as jnp
    from hybridgl_tpu.models.sam.amg import Proposals
    from hybridgl_tpu.pipeline.postprocess import postprocess_small_regions

    C = pipeline.cfg.canonical_size
    P = 16
    h, w = 24, 32
    rng = np.random.default_rng(3)
    masks = np.zeros((P, C, C), bool)
    # 12 live masks: a solid block with a small hole (cleanup fills it) so
    # changed=True and the full rebuild path runs
    for i in range(12):
        masks[i, 2:20, 2:26] = True
        masks[i, 8 + (i % 4), 10] = False
    valid = np.zeros(P, bool)
    valid[:12] = True
    boxes = np.zeros((P, 4), np.float32)
    boxes[:12] = [2, 2, 25, 19]
    props = Proposals(
        masks=jnp.asarray(masks),
        boxes_xyxy=jnp.asarray(boxes),
        iou_preds=jnp.ones(P, jnp.float32),
        stability=jnp.ones(P, jnp.float32),
        points=jnp.zeros((P, 2), jnp.float32),
        areas=jnp.asarray(masks.sum((-2, -1)), jnp.float32),
        valid=np.asarray(valid),
        num=np.int32(12),
        overflow=np.int32(0),
    )
    packed = jnp.asarray(np.packbits(masks, axis=-1))
    packed_head = packed[:8]
    aux = jnp.concatenate(
        [
            jnp.asarray(boxes.ravel()),
            jnp.ones(P, jnp.float32),
            jnp.ones(P, jnp.float32),
            jnp.zeros(P * 2, jnp.float32),
            jnp.asarray(masks.sum((-2, -1)), jnp.float32),
        ]
    )
    # min_mask_region_area must be > hole size for the fill to trigger
    old_area = pipeline.cfg.amg.min_mask_region_area
    assert old_area > 1
    out = pipeline._cleanup_host(props, (h, w), packed, packed_head, aux)
    assert out.masks.shape == (P, C, C)
    assert out.valid.shape == (P,)
    want, changed = postprocess_small_regions(
        props._replace(masks=masks),
        old_area,
        max(pipeline.cfg.amg.box_nms_thresh, pipeline.cfg.amg.crop_nms_thresh),
        return_changed=True,
        hw=(h, w),
    )
    assert changed
    np.testing.assert_array_equal(np.asarray(out.masks), np.asarray(want.masks))
    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(want.valid))
