"""Fused CLIP attention kernel (kernels/clip_attention.py) vs the XLA path.

The torch-oracle batteries (test_clip_model.py, test_fusion.py) exercise
the fused path end-to-end (it is default-ON and runs in interpret mode on
CPU); these tests pin the fused == unfused equivalence directly, including
the compact CLS-row bias and its full-bias expansion.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hybridgl_tpu.models.clip.layers import (
    cls_bias_to_attn_bias,
    multi_head_attention,
)
from hybridgl_tpu.models.clip.fusion import make_attn_bias, make_cls_bias


def _mha_params(rng, D):
    s = 0.05
    return {
        "in_proj_w": jnp.asarray(rng.standard_normal((D, 3 * D)) * s, jnp.float32),
        "in_proj_b": jnp.asarray(rng.standard_normal(3 * D) * s, jnp.float32),
        "out_w": jnp.asarray(rng.standard_normal((D, D)) * s, jnp.float32),
        "out_b": jnp.asarray(rng.standard_normal(D) * s, jnp.float32),
    }


@pytest.mark.parametrize("with_cls", [False, True])
def test_fused_matches_xla(rng, with_cls, monkeypatch):
    N, L, D, H = 3, 17, 32, 4  # odd L: no alignment crutch in interpret mode
    p = _mha_params(rng, D)
    x = jnp.asarray(rng.standard_normal((N, L, D)), jnp.float32)
    cls = None
    if with_cls:
        ok = rng.random((N, L)) > 0.4
        ok[:, 0] = True  # CLS attends itself
        cls = jnp.where(jnp.asarray(ok), 0.0, jnp.finfo(jnp.float32).min)

    monkeypatch.setenv("HYBRIDGL_FUSED_CLIP", "1")
    fused = multi_head_attention(p, x, H, cls_bias=cls)
    monkeypatch.setenv("HYBRIDGL_FUSED_CLIP", "0")
    ref = multi_head_attention(p, x, H, cls_bias=cls)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_cls_expansion_matches_full_bias(rng):
    g, P = 4, 5
    masks = jnp.asarray((rng.random((P, g, g)) > 0.5).astype(np.float32))
    full = make_attn_bias(masks)  # [P, 1, L, L]
    compact = cls_bias_to_attn_bias(make_cls_bias(masks))  # [P, 1, L, L]
    np.testing.assert_array_equal(np.asarray(full), np.asarray(compact))


def test_max_rows_boundary_runs_fused(rng, monkeypatch):
    """L == MAX_ROWS is the largest sequence the single-tile kernel
    accepts; pin that the fused path still runs (and agrees with XLA)
    exactly at the cap rather than silently falling back."""
    from hybridgl_tpu.kernels.clip_attention import MAX_ROWS

    N, L, D, H = 2, MAX_ROWS, 16, 2
    p = _mha_params(rng, D)
    x = jnp.asarray(rng.standard_normal((N, L, D)), jnp.float32)
    ok = rng.random((N, L)) > 0.3
    ok[:, 0] = True
    cls = jnp.where(jnp.asarray(ok), 0.0, jnp.finfo(jnp.float32).min)
    monkeypatch.setenv("HYBRIDGL_FUSED_CLIP", "1")
    fused = multi_head_attention(p, x, H, cls_bias=cls)
    monkeypatch.setenv("HYBRIDGL_FUSED_CLIP", "0")
    ref = multi_head_attention(p, x, H, cls_bias=cls)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_above_max_rows_routes_to_xla(rng, monkeypatch):
    """Sequences above MAX_ROWS must route to the XLA path (the kernel is
    single-tile whole-row); assert the routing directly by counting kernel
    invocations instead of comparing two identical XLA runs."""
    import hybridgl_tpu.models.clip.layers as layers_mod

    N, L, D, H = 2, 600, 16, 2
    p = _mha_params(rng, D)
    x = jnp.asarray(rng.standard_normal((N, L, D)), jnp.float32)
    calls = []
    orig = layers_mod.use_fused_clip

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setenv("HYBRIDGL_FUSED_CLIP", "1")
    monkeypatch.setattr(layers_mod, "use_fused_clip", counting)
    out = multi_head_attention(p, x, H)
    assert out.shape == (N, L, D)
    # above the cap the L <= MAX_ROWS guard short-circuits before the
    # fused-path predicate is even consulted
    assert not calls
