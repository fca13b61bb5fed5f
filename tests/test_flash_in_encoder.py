"""Flash-attention path inside the SAM encoder == the unfused path."""

import numpy as np
import pytest

import jax.numpy as jnp

from hybridgl_tpu.core.config import SamConfig
from hybridgl_tpu.core.params import init_sam
from hybridgl_tpu.models.sam.image_encoder import encode_image


@pytest.fixture()
def flash_env(monkeypatch):
    def set_flag(v):
        monkeypatch.setenv("HYBRIDGL_FLASH", v)

    return set_flag


@pytest.mark.slow
def test_encoder_flash_matches_unfused(rng, flash_env):
    import jax

    # grid 32 (img 512) so the size>=32 flash gate opens; 2 blocks, 1 global
    cfg = SamConfig(
        img_size=512,
        encoder_width=64,
        encoder_depth=2,
        encoder_heads=2,
        encoder_global_idx=(1,),
        window_size=14,
        prompt_dim=32,
    )
    params = init_sam(jax.random.PRNGKey(0), cfg)
    # nonzero rel-pos so the bias actually matters
    for blk in params["encoder"]["blocks"]:
        for key in ("rel_pos_h", "rel_pos_w"):
            blk["attn"][key] = (
                jax.random.normal(jax.random.PRNGKey(1), blk["attn"][key].shape) * 0.2
            )
    img = rng.standard_normal((1, cfg.img_size, cfg.img_size, 3), dtype=np.float32)

    flash_env("0")
    ref = np.asarray(encode_image(params["encoder"], jnp.asarray(img), cfg))
    flash_env("1")
    ours = np.asarray(encode_image(params["encoder"], jnp.asarray(img), cfg))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)
