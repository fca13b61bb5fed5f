"""Full CLI end-to-end smoke on tiny models + synthetic REFER data."""

import os

import pytest

from hybridgl_tpu.cli.main import main as cli_main

from test_data_layer import refer_root  # noqa: F401 (fixture)

pytestmark = pytest.mark.slow  # whole-pipeline / mesh tests, ~30-70s each


def test_cli_end_to_end(refer_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    log_dir = str(tmp_path / "logs")
    parity = str(tmp_path / "parity.json")
    progress = str(tmp_path / "progress.json")
    cli_main(
        [
            "--dataset", "refcoco",
            "--split", "val",
            "--fusion_mode", "G2L",
            "--refer_data_root", refer_root,
            "--clip_model", "test-tiny",
            "--sam_model", "test-tiny",
            "--random-weights",
            "--log_dir", log_dir,
            "--parity_log", parity,
            "--progress_file", progress,
            "--profile",
        ]
    )
    log_path = os.path.join(log_dir, "result_log_refcoco_val.txt")
    assert os.path.exists(log_path)
    text = open(log_path).read()
    assert "pure hybridgl:" in text
    assert "hybridgl w/ spatial guidance:" in text
    assert os.path.exists(parity)

    import json

    with open(parity) as f:
        records = json.load(f)["records"]
    assert len(records) == 1  # one val ref, one sentence
    assert records[0]["sentence"] == "the left square"


def test_cli_demo_end_to_end(tmp_path, monkeypatch):
    import numpy as np
    from PIL import Image

    from hybridgl_tpu.cli.demo import main as demo_main

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    img_path = str(tmp_path / "img.jpg")
    Image.fromarray(rng.integers(0, 255, (48, 64, 3), np.uint8)).save(img_path)
    out = str(tmp_path / "result.jpg")
    demo_main(
        [
            "--img_path", img_path,
            "--ref_text", "the thing on the left",
            "--clip_model", "test-tiny",
            "--sam_model", "test-tiny",
            "--random-weights",
            "--out", out,
        ]
    )
    assert os.path.exists(out)


def test_cli_data_parallel(refer_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    log_dir = str(tmp_path / "logs_dp")
    cli_main(
        [
            "--dataset", "refcoco",
            "--split", "val",
            "--refer_data_root", refer_root,
            "--clip_model", "test-tiny",
            "--sam_model", "test-tiny",
            "--random-weights",
            "--log_dir", log_dir,
            "--data_parallel",
        ]
    )
    log_path = os.path.join(log_dir, "result_log_refcoco_val.txt")
    assert os.path.exists(log_path)
    assert "pure hybridgl:" in open(log_path).read()


def test_cli_show_results(refer_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    log_dir = str(tmp_path / "logs_viz")
    cli_main(
        [
            "--dataset", "refcoco",
            "--split", "val",
            "--refer_data_root", refer_root,
            "--clip_model", "test-tiny",
            "--sam_model", "test-tiny",
            "--random-weights",
            "--log_dir", log_dir,
            "--show_results",
        ]
    )
    viz = os.path.join(log_dir, "results_viz")
    assert os.path.isdir(viz)
    assert len(os.listdir(viz)) >= 1
