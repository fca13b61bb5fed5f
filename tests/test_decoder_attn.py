"""Fused i2t+LN kernel == the side-switched XLA chain (both decoder sites)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hybridgl_tpu.core.params import init_sam
from hybridgl_tpu.models.sam import decoder as dec

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from torch_ref_sam import tiny_sam_config


def _setup(rng):
    cfg = tiny_sam_config()
    p = init_sam(jax.random.PRNGKey(0), cfg)["decoder"]
    B, T = 3, 7
    g, C = cfg.embed_grid, cfg.prompt_dim
    S = g * g
    queries = jnp.asarray(rng.standard_normal((B, T, C), dtype=np.float32) * 0.5)
    pe_tok = jnp.asarray(rng.standard_normal((B, T, C), dtype=np.float32) * 0.5)
    keys = jnp.asarray(rng.standard_normal((B, S, C), dtype=np.float32) * 0.5)
    img_pe = jnp.asarray(rng.standard_normal((1, S, C), dtype=np.float32) * 0.5)
    return cfg, p, queries, pe_tok, keys, img_pe


def test_fused_i2t_generic_site_matches_xla(rng, monkeypatch):
    cfg, p, queries, pe_tok, keys, img_pe = _setup(rng)
    h = cfg.decoder_heads
    layer = p["transformer"]["layers"][1]
    kpe = keys + img_pe
    q = queries + pe_tok

    ref = dec._ln(
        layer["norm4"],
        keys + dec._i2t_attn(layer["cross_i2t"], kpe, q, queries, h),
    )
    tp = dec._tp_for(q.shape[1])
    from hybridgl_tpu.kernels.decoder_attn import i2t_ln_update

    w, off, vo, const = dec._i2t_prep_generic(layer["cross_i2t"], q, queries, h, tp)
    out = i2t_ln_update(
        kpe, keys, w, off, vo, const,
        layer["norm4"]["scale"], layer["norm4"]["bias"], h, tp,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_i2t_shared_site_matches_xla(rng):
    cfg, p, queries, pe_tok, keys, img_pe = _setup(rng)
    h = cfg.decoder_heads
    layer0 = p["transformer"]["layers"][0]
    # shared-image layer-0 shapes: un-batched image stream
    img = keys[0]
    k_img = img + img_pe[0]
    q = queries + pe_tok

    ref = dec._ln(
        layer0["norm4"],
        img[None] + dec._attn_shared_q(layer0["cross_i2t"], k_img, q, queries, h),
    )
    tp = dec._tp_for(q.shape[1])
    from hybridgl_tpu.kernels.decoder_attn import i2t_ln_update

    p0 = layer0["cross_i2t"]
    qproj = dec._lin(p0["q"], k_img.astype(queries.dtype))
    w, off, vo, const = dec._i2t_prep_shared_q(p0, q, queries, h, tp)
    out = i2t_ln_update(
        qproj[None], img[None], w, off, vo, const,
        layer0["norm4"]["scale"], layer0["norm4"]["bias"], h, tp,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_t2i_matches_xla(rng):
    cfg, p, queries, pe_tok, keys, img_pe = _setup(rng)
    h = cfg.decoder_heads
    layer = p["transformer"]["layers"][1]
    q = queries + pe_tok
    kpe = keys + img_pe

    ref = dec._t2i_attn(layer["cross_t2i"], q, kpe, keys, h)
    out = dec._t2i_fused(layer["cross_t2i"], q, keys, img_pe, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_t2i_extreme_logits_stable(rng):
    cfg, p, queries, pe_tok, keys, img_pe = _setup(rng)
    h = cfg.decoder_heads
    layer = p["transformer"]["layers"][1]
    q = (queries + pe_tok) * 40.0  # large scores: online softmax must hold
    ref = dec._t2i_attn(layer["cross_t2i"], q, keys + img_pe, keys, h)
    out = dec._t2i_fused(layer["cross_t2i"], q, keys, img_pe, h)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)
