"""CLI surface tests (arg parsing + config wiring; heavy paths not run)."""

import pytest

from hybridgl_tpu.cli.main import build_config, default_argument_parser


def test_reference_flag_surface_parses():
    p = default_argument_parser()
    args = p.parse_args(
        [
            "--dataset", "refcoco", "--split", "val", "--fusion_mode", "G2L",
            "--refer_data_root", "/tmp/refer",
            # vestigial detectron2-era flags must still parse (utils.py:424-447)
            "--num-gpus", "8", "--machine-rank", "0", "--dist-url", "tcp://x:1",
            "--config-file", "cfg.yaml",
        ]
    )
    assert args.eval_only  # store_false default -> True, like the reference
    cfg = build_config(args)
    assert cfg.fusion_mode == "G2L"
    assert args.splitBy == "unc"  # refcoco -> unc override
    assert cfg.canonical_size == 640
    assert cfg.amg.points_per_side == 8


def test_refcocog_split_by():
    p = default_argument_parser()
    args = p.parse_args(["--dataset", "refcocog"])
    build_config(args)
    assert args.splitBy == "umd"


def test_phrasecut_config():
    p = default_argument_parser()
    args = p.parse_args(["--dataset", "phrasecut", "--split", "test"])
    cfg = build_config(args)
    assert cfg.amg.points_per_side == 64
    assert cfg.amg.crop_n_layers == 1
    assert cfg.canonical_size == 1024


def test_bug_compat_toggle():
    p = default_argument_parser()
    args = p.parse_args(["--no-bug-compat"])
    cfg = build_config(args)
    assert not cfg.compat.k_clamp_sticky
    assert not cfg.compat.rela_right_bug


def test_missing_checkpoints_errors():
    from hybridgl_tpu.cli.main import load_params

    p = default_argument_parser()
    args = p.parse_args([])
    cfg = build_config(args)
    with pytest.raises(SystemExit):
        load_params(args, cfg)


def test_max_proposals_override():
    p = default_argument_parser()
    args = p.parse_args(["--max_proposals", "32"])
    cfg = build_config(args)
    assert cfg.amg.max_proposals == 32
