"""Full-parity multi-chip eval step vs the sequential pipeline."""

import numpy as np
import pytest

import jax

from hybridgl_tpu.lang import HeuristicParser
from hybridgl_tpu.parallel.full_eval import (
    FullEvalBatch,
    build_full_eval_step,
    place_batch,
    prepare_records,
)
from hybridgl_tpu.parallel.mesh import make_mesh, make_mesh_2d
from hybridgl_tpu.pipeline.runner import HybridGLPipeline, materialize_results

from test_pipeline_e2e import FakeTokenizer, make_sample, pipeline  # noqa: F401

pytestmark = pytest.mark.slow  # whole-pipeline / mesh tests, ~30-70s each


@pytest.fixture(scope="module")
def cfg_no_cleanup(pipeline):
    # the sharded step skips host cleanup; compare against a sequential run
    # with the same semantics (min_mask_region_area=0, non-sticky clamps)
    import dataclasses

    from hybridgl_tpu.core.config import CompatConfig

    cfg = pipeline.cfg.replace(
        amg=dataclasses.replace(pipeline.cfg.amg, min_mask_region_area=0),
        compat=CompatConfig(k_clamp_sticky=False),
    )
    return cfg


def test_full_eval_matches_sequential(pipeline, cfg_no_cleanup):
    cfg = cfg_no_cleanup
    parser = HeuristicParser()
    tokenizer = FakeTokenizer()
    seq_pipe = HybridGLPipeline(
        cfg, pipeline.sam_params, pipeline.clip_params,
        parser=parser, tokenizer=tokenizer,
    )
    rng = np.random.default_rng(11)
    samples = [make_sample(rng, cfg.sam) for _ in range(4)]

    # sequential reference
    state = seq_pipe.init_state()
    seq_results = [
        materialize_results(seq_pipe.run_image(s, state)) for s in samples
    ]

    # sharded full eval (4-way dp)
    batch = prepare_records(samples, parser, cfg, tokenizer=tokenizer, max_sentences=2)
    mesh = make_mesh(4)
    step = build_full_eval_step(cfg, mesh)
    pa, fa, pidx, fidx, pious, fious = step(
        seq_pipe.sam_params, seq_pipe.clip_params, place_batch(batch, mesh)
    )

    assert int(pa.count) == int(state.pure.count)
    np.testing.assert_allclose(float(pa.cum_i), float(state.pure.cum_i), rtol=1e-5)
    np.testing.assert_allclose(float(fa.cum_i), float(state.final.cum_i), rtol=1e-5)
    np.testing.assert_allclose(float(fa.sum_iou), float(state.final.sum_iou), rtol=1e-4)

    pidx = np.asarray(pidx)
    fidx = np.asarray(fidx)
    pious = np.asarray(pious)
    fious = np.asarray(fious)
    for b, results in enumerate(seq_results):
        for si, r in enumerate(results):
            assert pidx[b, si] == r.pure_index
            assert fidx[b, si] == r.final_index
            assert abs(pious[b, si] - r.pure_iou) < 1e-5
            assert abs(fious[b, si] - r.final_iou) < 1e-5


def test_full_eval_2d_mesh(pipeline, cfg_no_cleanup):
    cfg = cfg_no_cleanup
    parser = HeuristicParser()
    rng = np.random.default_rng(12)
    samples = [make_sample(rng, cfg.sam) for _ in range(4)]
    batch = prepare_records(samples, parser, cfg, tokenizer=FakeTokenizer(), max_sentences=2)

    mesh1 = make_mesh(4)
    step1 = build_full_eval_step(cfg, mesh1)
    pa1, fa1, pi1, fi1, *_ = step1(
        pipeline.sam_params, pipeline.clip_params, place_batch(batch, mesh1)
    )

    mesh2 = make_mesh_2d(8, mp=2)
    step2 = build_full_eval_step(cfg, mesh2, mp_axis="mp")
    pa2, fa2, pi2, fi2, *_ = step2(
        pipeline.sam_params, pipeline.clip_params, place_batch(batch, mesh2)
    )
    np.testing.assert_allclose(float(pa2.cum_i), float(pa1.cum_i), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(fi2), np.asarray(fi1))


def test_full_eval_sticky_cleanup_exact_parity(pipeline):
    """--data_parallel with sticky=True + in-step cleanup must reproduce the
    sequential driver EXACTLY: same sticky k trajectory, same per-sentence
    selections and IoUs, same accumulators (the round-1 DP parity gap)."""
    import dataclasses

    from hybridgl_tpu.core.config import CompatConfig
    from hybridgl_tpu.parallel.full_eval import finalize_sticky

    cfg = pipeline.cfg.replace(
        amg=dataclasses.replace(pipeline.cfg.amg, min_mask_region_area=6),
        compat=CompatConfig(k_clamp_sticky=True),
    )
    parser = HeuristicParser()
    tokenizer = FakeTokenizer()
    seq_pipe = HybridGLPipeline(
        cfg, pipeline.sam_params, pipeline.clip_params,
        parser=parser, tokenizer=tokenizer,
    )
    rng = np.random.default_rng(21)
    samples = [make_sample(rng, cfg.sam) for _ in range(4)]

    state = seq_pipe.init_state()
    seq_results = [
        materialize_results(seq_pipe.run_image(s, state)) for s in samples
    ]

    batch = prepare_records(samples, parser, cfg, tokenizer=tokenizer, max_sentences=2)
    mesh = make_mesh(4)
    step = build_full_eval_step(cfg, mesh, sticky=True)
    ings = step(seq_pipe.sam_params, seq_pipe.clip_params, place_batch(batch, mesh))
    pa, fa, pidx, fidx, pious, fious, k1, k2 = finalize_sticky(
        cfg, ings, batch, cfg.guidance.k1, cfg.guidance.k2
    )

    assert (k1, k2) == (state.k1, state.k2), "sticky clamp trajectory diverged"
    assert int(pa.count) == int(state.pure.count)
    np.testing.assert_allclose(float(pa.cum_i), float(state.pure.cum_i), rtol=1e-5)
    np.testing.assert_allclose(float(pa.cum_u), float(state.pure.cum_u), rtol=1e-5)
    np.testing.assert_allclose(float(fa.cum_i), float(state.final.cum_i), rtol=1e-5)
    np.testing.assert_allclose(float(fa.sum_iou), float(state.final.sum_iou), rtol=1e-4)
    for b, results in enumerate(seq_results):
        for si, r in enumerate(results):
            assert pidx[b, si] == r.pure_index, (b, si)
            assert fidx[b, si] == r.final_index, (b, si)
            assert abs(pious[b, si] - r.pure_iou) < 1e-5
            assert abs(fious[b, si] - r.final_iou) < 1e-5


def test_sticky_downlink_bound(pipeline):
    """The sticky replay's per-image device->host payload must stay small
    (VERDICT r2 weak #7): the accounting helper must match the actual
    Ingredients array sizes, and the production config (P=64, S=8) must
    stay under 32 KiB/img."""
    from hybridgl_tpu.parallel.full_eval import (
        Ingredients,
        ingredients_nbytes_per_image,
    )

    P = pipeline.cfg.amg.max_proposals
    S = 2
    ing = Ingredients(
        num=np.int32(0),
        score=np.zeros((S, P), np.float32),
        score_neg=np.zeros((S, P), np.float32),
        gem_scores=np.zeros((S, P), np.float32),
        boxes_xywh=np.zeros((P, 4), np.float32),
        prop_valid=np.zeros(P, bool),
        iu=np.zeros((P, 3), np.float32),
    )
    actual = sum(np.asarray(x).nbytes for x in ing)
    assert actual == ingredients_nbytes_per_image(P, S)
    assert ingredients_nbytes_per_image(64, 8) <= 32 * 1024


def test_full_eval_zero_proposal_miss_matches_sequential(pipeline, cfg_no_cleanup):
    """Zero-proposal images must count as per-sentence MISSES in the
    non-sticky DP step exactly like runner._score_image: I=0, U=gt_area,
    IoU=0, count+1 (regression: they were silently dropped)."""
    import dataclasses

    cfg = cfg_no_cleanup.replace(
        amg=dataclasses.replace(
            cfg_no_cleanup.amg, pred_iou_thresh=0.999, stability_score_thresh=0.999
        )
    )
    parser = HeuristicParser()
    tokenizer = FakeTokenizer()
    seq_pipe = HybridGLPipeline(
        cfg, pipeline.sam_params, pipeline.clip_params,
        parser=parser, tokenizer=tokenizer,
    )
    rng = np.random.default_rng(21)
    samples = [make_sample(rng, cfg.sam) for _ in range(4)]

    state = seq_pipe.init_state()
    for s in samples:
        seq_pipe.run_image(s, state)

    batch = prepare_records(samples, parser, cfg, tokenizer=tokenizer, max_sentences=2)
    mesh = make_mesh(4)
    step = build_full_eval_step(cfg, mesh)
    pa, fa, *_ = step(
        seq_pipe.sam_params, seq_pipe.clip_params, place_batch(batch, mesh)
    )
    # the premise must actually hold or the miss branch goes unexercised:
    # with 0.999 thresholds on random weights some image has no proposals
    props = [seq_pipe.propose(s) for s in samples]
    assert any(int(p.num) == 0 for p in props), "precondition lost: no zero-proposal image"
    assert int(pa.count) == int(state.pure.count)
    np.testing.assert_allclose(float(pa.cum_u), float(state.pure.cum_u), rtol=1e-5)
    np.testing.assert_allclose(float(fa.cum_u), float(state.final.cum_u), rtol=1e-5)
    np.testing.assert_allclose(float(pa.cum_i), float(state.pure.cum_i), rtol=1e-5)


def test_full_eval_multicrop_dispatch(pipeline):
    """crop_n_layers >= 1 must route the DP step through the multi-crop
    AMG like the sequential driver (regression: it ran single-crop)."""
    import dataclasses

    from hybridgl_tpu.core.config import CompatConfig

    cfg = pipeline.cfg.replace(
        amg=dataclasses.replace(
            pipeline.cfg.amg, min_mask_region_area=0, crop_n_layers=1,
            max_candidates_per_crop=8,
        ),
        compat=CompatConfig(k_clamp_sticky=False),
    )
    parser = HeuristicParser()
    tokenizer = FakeTokenizer()
    seq_pipe = HybridGLPipeline(
        cfg, pipeline.sam_params, pipeline.clip_params,
        parser=parser, tokenizer=tokenizer,
    )
    rng = np.random.default_rng(22)
    samples = [make_sample(rng, cfg.sam) for _ in range(4)]

    state = seq_pipe.init_state()
    for s in samples:
        seq_pipe.run_image(s, state)

    batch = prepare_records(samples, parser, cfg, tokenizer=tokenizer, max_sentences=2)
    mesh = make_mesh(4)
    step = build_full_eval_step(cfg, mesh)
    pa, fa, pidx, fidx, *_ = step(
        seq_pipe.sam_params, seq_pipe.clip_params, place_batch(batch, mesh)
    )
    assert int(pa.count) == int(state.pure.count)
    np.testing.assert_allclose(float(pa.cum_i), float(state.pure.cum_i), rtol=1e-5)
    np.testing.assert_allclose(float(fa.sum_iou), float(state.final.sum_iou), rtol=1e-4)
