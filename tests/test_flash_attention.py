import numpy as np
import pytest

import jax.numpy as jnp

from hybridgl_tpu.kernels.flash_attention import (
    flash_attention_rel_pos,
    reference_attention_rel_pos,
)


@pytest.mark.parametrize("block_q,block_k", [(32, 32), (64, 16), (16, 64)])
def test_flash_matches_reference(rng, block_q, block_k):
    G = 8
    S = G * G
    BH, hd = 3, 16
    q = rng.standard_normal((BH, S, hd), dtype=np.float32) * 0.3
    k = rng.standard_normal((BH, S, hd), dtype=np.float32) * 0.3
    v = rng.standard_normal((BH, S, hd), dtype=np.float32)
    rel_h = rng.standard_normal((BH, S, G), dtype=np.float32) * 0.5
    rel_w = rng.standard_normal((BH, S, G), dtype=np.float32) * 0.5

    ref = np.asarray(
        reference_attention_rel_pos(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(rel_h), jnp.asarray(rel_w), G,
        )
    )
    ours = np.asarray(
        flash_attention_rel_pos(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(rel_h), jnp.asarray(rel_w), G,
            block_q=block_q, block_k=block_k, interpret=True,
        )
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_flash_windowed_geometry(rng):
    # the 14x14 windowed-block configuration: S == G^2 == block_q ==
    # block_k (one whole window per program) at the SAM head dim
    G = 14
    S = G * G
    BH, hd = 4, 80
    q = rng.standard_normal((BH, S, hd), dtype=np.float32) * 0.3
    k = rng.standard_normal((BH, S, hd), dtype=np.float32) * 0.3
    v = rng.standard_normal((BH, S, hd), dtype=np.float32)
    rel_h = rng.standard_normal((BH, S, G), dtype=np.float32) * 0.5
    rel_w = rng.standard_normal((BH, S, G), dtype=np.float32) * 0.5
    ref = np.asarray(
        reference_attention_rel_pos(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(rel_h), jnp.asarray(rel_w), G,
        )
    )
    ours = np.asarray(
        flash_attention_rel_pos(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(rel_h), jnp.asarray(rel_w), G,
            block_q=S, block_k=S, interpret=True,
        )
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_flash_windowed_fused_matches_reference(rng):
    # the whole-window kernel (qkv natural layout, heads unrolled inside)
    # + its block-diagonal rel-term builder vs the unfused reference
    from hybridgl_tpu.kernels.flash_attention import (
        flash_windowed_fused,
        windowed_rel_terms,
    )

    B, G, H, hd = 2, 8, 2, 16
    S, D = G * G, H * 16
    qkv = rng.standard_normal((B, S, 3 * D), dtype=np.float32) * 0.3
    Rh = rng.standard_normal((G, G, hd), dtype=np.float32) * 0.2
    Rw = rng.standard_normal((G, G, hd), dtype=np.float32) * 0.2
    rel_h, rel_w = windowed_rel_terms(
        jnp.asarray(qkv), jnp.asarray(Rh), jnp.asarray(Rw), H, G
    )

    def split(i):
        return (
            qkv[..., i * D : (i + 1) * D]
            .reshape(B, S, H, hd)
            .transpose(0, 2, 1, 3)
            .reshape(B * H, S, hd)
        )

    q, k, v = split(0), split(1), split(2)
    rq = q.reshape(B * H, G, G, hd)
    ref_rel_h = np.einsum("bhwc,hkc->bhwk", rq, Rh).reshape(B * H, S, G)
    ref_rel_w = np.einsum("bhwc,wkc->bhwk", rq, Rw).reshape(B * H, S, G)
    np.testing.assert_allclose(
        np.asarray(rel_h).reshape(B, S, H, G).transpose(0, 2, 1, 3).reshape(B * H, S, G),
        ref_rel_h, atol=2e-5, rtol=2e-5,
    )
    scale = hd**-0.5
    ref = np.asarray(
        reference_attention_rel_pos(
            jnp.asarray(q * scale), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(ref_rel_h), jnp.asarray(ref_rel_w), G,
        )
    ).reshape(B, H, S, hd).transpose(0, 2, 1, 3).reshape(B, S, D)
    from hybridgl_tpu.kernels.flash_attention import windowed_lane

    padded = np.asarray(
        flash_windowed_fused(jnp.asarray(qkv), rel_h, rel_w, H, G, interpret=True)
    )
    lane = windowed_lane(hd, G, interpret=True)
    ours4 = padded.reshape(B, S, H, lane)
    assert np.all(ours4[..., hd:] == 0.0), "pad lanes must stay zero"
    ours = ours4[..., :hd].reshape(B, S, D)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_flash_extreme_logits_stable(rng):
    # online softmax must stay finite with large score magnitudes
    G, BH, hd = 8, 1, 8
    S = G * G
    q = rng.standard_normal((BH, S, hd), dtype=np.float32) * 30
    k = rng.standard_normal((BH, S, hd), dtype=np.float32) * 30
    v = rng.standard_normal((BH, S, hd), dtype=np.float32)
    zeros = np.zeros((BH, S, G), np.float32)
    out = np.asarray(
        flash_attention_rel_pos(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(zeros), jnp.asarray(zeros), G,
            block_q=16, block_k=16, interpret=True,
        )
    )
    assert np.isfinite(out).all()
    ref = np.asarray(
        reference_attention_rel_pos(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(zeros), jnp.asarray(zeros), G,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("block_q,block_k", [(32, 32), (64, 16), (16, 64)])
def test_flash_fused_matches_reference(rng, block_q, block_k):
    # the augmented-contraction tiled kernel (global blocks' serving path)
    from hybridgl_tpu.kernels.flash_attention import flash_attention_fused

    G = 8
    S = G * G
    BH, hd = 3, 16
    q = rng.standard_normal((BH, S, hd), dtype=np.float32) * 0.3
    k = rng.standard_normal((BH, S, hd), dtype=np.float32) * 0.3
    v = rng.standard_normal((BH, S, hd), dtype=np.float32)
    rel_h = rng.standard_normal((BH, S, G), dtype=np.float32) * 0.5
    rel_w = rng.standard_normal((BH, S, G), dtype=np.float32) * 0.5
    ref = np.asarray(
        reference_attention_rel_pos(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(rel_h), jnp.asarray(rel_w), G,
        )
    )
    out = np.asarray(
        flash_attention_fused(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(rel_h), jnp.asarray(rel_w), G,
            block_q=block_q, block_k=block_k, interpret=True,
        )
    )
    assert out.shape == (BH, S, hd)  # interpret mode: lane_v == hd
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_flash_fused_extreme_logits_stable(rng):
    from hybridgl_tpu.kernels.flash_attention import flash_attention_fused

    G, BH, hd = 8, 1, 8
    S = G * G
    q = rng.standard_normal((BH, S, hd), dtype=np.float32) * 30
    k = rng.standard_normal((BH, S, hd), dtype=np.float32) * 30
    v = rng.standard_normal((BH, S, hd), dtype=np.float32)
    zeros = np.zeros((BH, S, G), np.float32)
    out = np.asarray(
        flash_attention_fused(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(zeros), jnp.asarray(zeros), G,
            block_q=16, block_k=16, interpret=True,
        )
    )
    assert np.isfinite(out).all()
    ref = np.asarray(
        reference_attention_rel_pos(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(zeros), jnp.asarray(zeros), G,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
