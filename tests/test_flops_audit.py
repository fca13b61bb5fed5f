"""The analytic FLOPs model must agree with XLA's own cost analysis.

The bench's MFU fields are only as honest as hybridgl_tpu/utils/flops.py;
tools/flops_audit.py compiles each stage on the XLA-fallback path and
compares ``compiled.cost_analysis()["flops"]`` against the model
(VERDICT r4 #2). This test runs the audit at the real ViT-B geometry —
full 1024^2 encoder, production decode chunk, 16-proposal fusion — so a
formula drifting from the implementation fails CI, not just the tool.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from flops_audit import run_audit  # noqa: E402

from hybridgl_tpu.core.config import PipelineConfig  # noqa: E402


@pytest.mark.slow
def test_flops_model_matches_xla_cost_analysis():
    cfg = PipelineConfig(sam_model="vit_b", fusion_mode="G2L")
    results = run_audit(cfg, tol=0.10, n_proposals=16, verbose=False)
    stages = {r["stage"] for r in results}
    assert {"sam_encoder", "sam_decode", "clip_fusion", "gem", "text"} <= stages
    bad = [r for r in results if not r["ok"]]
    assert not bad, f"FLOPs model out of tolerance: {bad}"
    # the executed-decode model must stay well below the canonical count
    # (side-switched attentions + shared layer-0 are the whole point)
    dec = next(r for r in results if r["stage"] == "sam_decode")
    assert dec["model_gf"] < dec["canonical_gf"]
