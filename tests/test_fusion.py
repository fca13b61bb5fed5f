import numpy as np
import pytest
import torch

import jax.numpy as jnp

from hybridgl_tpu.core.convert import convert_clip
from hybridgl_tpu.models.clip.fusion import calculate_score, hybrid_forward

from torch_ref import make_tiny_clip, torch_hybrid_forward


@pytest.fixture(scope="module")
def setup():
    model, cfg = make_tiny_clip()
    params = convert_clip(model.openai_state_dict(), cfg)
    rng = np.random.default_rng(7)
    P = 6
    local = rng.standard_normal((P, cfg.image_size, cfg.image_size, 3), dtype=np.float32)
    glob = rng.standard_normal((P, cfg.image_size, cfg.image_size, 3), dtype=np.float32)
    masks = (rng.random((P, 20, 20)) > 0.6).astype(np.float32)
    masks[0] = 1.0  # full mask
    return model, cfg, params, local, glob, masks


MODES = ["crop", "token_masking", "attn_masking", "L2G", "G2L", "G2L&L2G"]


@pytest.mark.parametrize("mode", MODES)
def test_fusion_mode_matches_torch(setup, mode):
    model, cfg, params, local, glob, masks = setup
    mb = cfg.vision_layers - 2  # analogue of masking_block=9 on a 3-block model
    ours = np.asarray(
        hybrid_forward(
            params["visual"],
            jnp.asarray(local),
            jnp.asarray(glob),
            jnp.asarray(masks),
            cfg,
            fusion_mode=mode,
            masking_block=mb,
        )
    )
    ref = torch_hybrid_forward(
        model,
        torch.from_numpy(local).permute(0, 3, 1, 2),
        torch.from_numpy(glob).permute(0, 3, 1, 2),
        torch.from_numpy(masks),
        mode,
        masking_block=mb,
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=5e-5)


def test_calculate_score(setup, rng):
    model, cfg, params, *_ = setup
    img = rng.standard_normal((5, cfg.embed_dim), dtype=np.float32)
    txt = rng.standard_normal((2, cfg.embed_dim), dtype=np.float32)
    s = np.asarray(
        calculate_score(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(params["logit_scale"]))
    )
    imgn = img / np.linalg.norm(img, axis=-1, keepdims=True)
    txtn = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    ref = np.exp(np.asarray(params["logit_scale"])) * imgn @ txtn.T
    np.testing.assert_allclose(s, ref, atol=1e-4, rtol=1e-4)
    assert s.shape == (5, 2)
