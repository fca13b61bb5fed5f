"""run_dataset (software-pipelined) must equal run_image image by image."""

import numpy as np
import pytest

from hybridgl_tpu.pipeline.runner import HybridGLPipeline, materialize_results

from test_pipeline_e2e import make_sample, pipeline  # noqa: F401  (fixture)


@pytest.mark.slow
def test_run_dataset_matches_run_image(pipeline: HybridGLPipeline):
    rng = np.random.default_rng(42)
    samples = [make_sample(rng, pipeline.cfg.sam) for _ in range(3)]

    state_a = pipeline.init_state()
    seq = [materialize_results(pipeline.run_image(s, state_a)) for s in samples]

    state_b = pipeline.init_state()
    piped = [materialize_results(r) for _, r in pipeline.run_dataset(iter(samples), state_b)]

    assert len(piped) == len(seq) == 3
    for a, b in zip(seq, piped):
        for ra, rb in zip(a, b):
            assert ra.pure_index == rb.pure_index
            assert ra.final_index == rb.final_index
            assert abs(ra.final_iou - rb.final_iou) < 1e-6
    assert abs(float(state_a.pure.sum_iou) - float(state_b.pure.sum_iou)) < 1e-6
    assert state_a.k1 == state_b.k1 and state_a.k2 == state_b.k2
