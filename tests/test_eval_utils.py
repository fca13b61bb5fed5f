import numpy as np

from hybridgl_tpu.eval.logging import ProgressCheckpoint, write_result_log
from hybridgl_tpu.eval.metrics import IoUAccum, compute_iou, report
from hybridgl_tpu.eval.parity import ParityLog, SelectionRecord, compare
from hybridgl_tpu.eval.viz import overlay_mask


def test_compute_iou_reference_semantics():
    pred = np.zeros((10, 10), bool)
    pred[:5] = True
    gt = np.zeros((10, 10), bool)
    gt[3:8] = True
    mean = []
    iou, mean, ci, cu = compute_iou(pred, gt, 0.0, 0.0, mean)
    assert abs(iou - 20 / 80) < 1e-9
    assert ci == 20 and cu == 80
    assert mean == [iou]
    # U == 0 -> iou 0 (reference: utils.py:373-374)
    z = np.zeros((4, 4), bool)
    iou2, mean, ci, cu = compute_iou(z, z, ci, cu, mean)
    assert iou2 == 0.0 and len(mean) == 2


def test_result_log_format(tmp_path):
    pure = IoUAccum(50.0, 100.0, 3.0, 5.0)
    final = IoUAccum(60.0, 100.0, 4.0, 5.0)
    path = write_result_log(
        str(tmp_path), "refcoco", "val", "unc", "G2L", pure, final, echo=False
    )
    text = open(path).read()
    assert "fusion_mode=G2L" in text
    assert "Dataset: refcoco / val / unc" in text
    assert "pure hybridgl: 50.00 / 60.00" in text
    assert "hybridgl w/ spatial guidance: 60.00 / 80.00" in text
    # append mode (reference opens with 'a', Hybridgl_main.py:235)
    write_result_log(str(tmp_path), "refcoco", "val", "unc", "G2L", pure, final, echo=False)
    assert open(path).read().count("fusion_mode=G2L") == 2


def test_progress_checkpoint_roundtrip(tmp_path):
    from hybridgl_tpu.pipeline.runner import PipelineState

    state = PipelineState(3, 6, IoUAccum(1.0, 2.0, 0.5, 1.0), IoUAccum(0, 0, 0, 0))
    ckpt = ProgressCheckpoint(str(tmp_path / "progress.json"))
    ckpt.save(41, state)
    state2 = PipelineState(3, 6, IoUAccum(0, 0, 0, 0), IoUAccum(0, 0, 0, 0))
    nxt = ckpt.load(state2)
    assert nxt == 42
    assert float(state2.pure.cum_i) == 1.0 and state2.k1 == 3


def test_parity_log_roundtrip_and_compare(tmp_path):
    a = ParityLog(meta={"run": "a"})
    b = ParityLog(meta={"run": "b"})
    for i in range(10):
        a.add(SelectionRecord(i, "s", i % 3, i % 3, 0.5, 0.6))
        b.add(SelectionRecord(i, "s", i % 3, (i % 3) if i < 8 else 9, 0.5, 0.6))
    path = str(tmp_path / "parity.json")
    a.save(path)
    a2 = ParityLog.load(path)
    out = compare(a2, b)
    assert out["n"] == 10
    assert out["pure_agreement"] == 1.0
    assert abs(out["final_agreement"] - 0.8) < 1e-9
    assert len(out["diffs"]) == 2


def test_overlay_mask():
    img = np.zeros((8, 8, 3), np.uint8)
    m = np.zeros((8, 8), bool)
    m[2:6, 2:6] = True
    out = overlay_mask(img, m, color=(0, 255, 0), alpha=0.5)
    assert out[3, 3, 1] > 0
    assert out[0, 0].tolist() == [0, 0, 0]


def test_a_is_part_of_b():
    from hybridgl_tpu.eval.metrics import a_is_part_of_b

    big = np.zeros((20, 20), bool)
    big[2:18, 2:18] = True
    inner = np.zeros((20, 20), bool)
    inner[4:16, 4:16] = True
    assert a_is_part_of_b(inner, big)
    other = np.zeros((20, 20), bool)
    other[0:3, 0:3] = True
    assert not a_is_part_of_b(other, big)


def test_top_level_exports():
    import hybridgl_tpu

    assert hybridgl_tpu.PipelineConfig is not None
    assert hybridgl_tpu.HybridGLPipeline is not None
    assert hybridgl_tpu.SamPredictor is not None
    assert callable(hybridgl_tpu.tokenize)


def test_stage_timer_summary():
    from hybridgl_tpu.utils.profiling import StageTimer

    t = StageTimer(block=False)
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    with t.span("b"):
        pass
    out = t.summary()
    assert "a" in out and "b" in out and "avg_ms" in out
