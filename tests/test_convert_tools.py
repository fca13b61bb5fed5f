"""Torch checkpoint loaders + conversion tool round trip."""

import subprocess
import sys

import numpy as np
import torch

import jax

from hybridgl_tpu.core import checkpoint
from hybridgl_tpu.core.convert import (
    infer_clip_config,
    load_torch_clip,
    load_torch_sam,
    normalize_state_dict,
)

from torch_ref import make_tiny_clip
from torch_ref_sam import make_tiny_sam


def test_infer_clip_config_from_shapes():
    model, cfg = make_tiny_clip()
    sd = normalize_state_dict(model.openai_state_dict())
    inferred = infer_clip_config(sd)
    assert inferred.vision_width == cfg.vision_width
    assert inferred.vision_layers == cfg.vision_layers
    assert inferred.patch_size == cfg.patch_size
    assert inferred.context_length == cfg.context_length
    assert inferred.embed_dim == cfg.embed_dim
    assert inferred.text_layers == cfg.text_layers


def test_load_torch_clip_state_dict(tmp_path):
    model, cfg = make_tiny_clip()
    path = str(tmp_path / "clip.pt")
    torch.save(model.openai_state_dict(), path)
    params, inferred = load_torch_clip(path)
    assert inferred.vision_width == cfg.vision_width
    np.testing.assert_array_equal(
        np.asarray(params["text"]["token_embedding"]),
        model.token_embedding.weight.detach().numpy(),
    )


def test_load_torch_sam_and_npz_roundtrip(tmp_path):
    model, cfg = make_tiny_sam()
    path = str(tmp_path / "sam.pth")
    torch.save(model.state_dict_upstream(), path)
    # tiny config isn't a registry preset; convert directly
    from hybridgl_tpu.core.convert import convert_sam

    sd = torch.load(path, map_location="cpu")
    params = convert_sam(sd, cfg)
    out = str(tmp_path / "sam.npz")
    checkpoint.save(out, params)
    loaded = checkpoint.load(out)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_convert_tool_cli(tmp_path):
    model, _ = make_tiny_clip()
    src = str(tmp_path / "tiny_clip.pt")
    torch.save(model.openai_state_dict(), src)
    out = subprocess.run(
        [sys.executable, "tools/convert_checkpoints.py", "--clip", src, "--out-dir", str(tmp_path)],
        capture_output=True,
        text=True,
    )
    assert out.returncode == 0, out.stderr
    assert (tmp_path / "tiny_clip.npz").exists()
