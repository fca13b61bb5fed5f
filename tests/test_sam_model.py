import numpy as np
import pytest
import torch

import jax.numpy as jnp

from hybridgl_tpu.core.convert import convert_sam
from hybridgl_tpu.models.sam.image_encoder import encode_image
from hybridgl_tpu.models.sam.prompt_encoder import dense_pe, embed_points, no_mask_dense
from hybridgl_tpu.models.sam.decoder import predict_masks
from hybridgl_tpu.models.sam import sam as sam_mod

from torch_ref_sam import make_tiny_sam


@pytest.fixture(scope="module")
def sam_pair():
    model, cfg = make_tiny_sam()
    params = convert_sam(model.state_dict_upstream(), cfg)
    return model, cfg, params


def test_image_encoder_matches_torch(sam_pair, rng):
    model, cfg, params = sam_pair
    img = rng.standard_normal((2, cfg.img_size, cfg.img_size, 3), dtype=np.float32)
    ours = np.asarray(encode_image(params["encoder"], jnp.asarray(img), cfg))
    with torch.no_grad():
        ref = model.image_encoder(torch.from_numpy(img).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=5e-5)


def test_prompt_encoder_matches_torch(sam_pair, rng):
    model, cfg, params = sam_pair
    B = 5
    coords = rng.random((B, 1, 2), dtype=np.float32) * cfg.img_size
    labels = np.ones((B, 1), np.float32)
    ours = np.asarray(
        embed_points(params["prompt"], jnp.asarray(coords), jnp.asarray(labels), cfg)
    )
    with torch.no_grad():
        ref = model.prompt_encoder.embed_points(
            torch.from_numpy(coords), torch.from_numpy(labels)
        ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)

    pe_ours = np.asarray(dense_pe(params["prompt"], cfg))
    with torch.no_grad():
        pe_ref = model.prompt_encoder.dense_pe().permute(1, 2, 0).numpy()
    np.testing.assert_allclose(pe_ours, pe_ref, atol=1e-5, rtol=1e-5)


def test_mask_decoder_matches_torch(sam_pair, rng):
    model, cfg, params = sam_pair
    g = cfg.embed_grid
    B = 4
    emb = rng.standard_normal((g, g, cfg.prompt_dim), dtype=np.float32)
    coords = rng.random((B, 1, 2), dtype=np.float32) * cfg.img_size
    labels = np.ones((B, 1), np.float32)

    sparse = embed_points(params["prompt"], jnp.asarray(coords), jnp.asarray(labels), cfg)
    dense = no_mask_dense(params["prompt"], cfg, B)
    pe = dense_pe(params["prompt"], cfg)
    masks, iou = predict_masks(
        params["decoder"], jnp.asarray(emb), pe, sparse, cfg, dense_prompts=dense
    )

    with torch.no_grad():
        t_sparse = model.prompt_encoder.embed_points(
            torch.from_numpy(coords), torch.from_numpy(labels)
        )
        t_dense = (
            model.prompt_encoder.no_mask_embed.weight[0]
            .reshape(1, -1, 1, 1)
            .expand(B, -1, g, g)
        )
        t_pe = model.prompt_encoder.dense_pe()
        t_emb = torch.from_numpy(emb).permute(2, 0, 1)
        t_masks, t_iou = model.mask_decoder(t_emb, t_pe, t_sparse, t_dense)

    np.testing.assert_allclose(np.asarray(iou), t_iou.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(masks), t_masks.numpy(), atol=1e-4, rtol=1e-4
    )


def test_shared_image_decoder_path_matches_batched(sam_pair, rng):
    """The AMG fast path (image side un-batched through decoder layer 0)
    is the same math as the per-prompt-batched path."""
    _, cfg, params = sam_pair
    g = cfg.embed_grid
    B = 6
    emb = jnp.asarray(
        rng.standard_normal((g, g, cfg.prompt_dim), dtype=np.float32)
    )
    coords = rng.random((B, 1, 2), dtype=np.float32) * cfg.img_size
    labels = np.ones((B, 1), np.float32)
    sparse = embed_points(params["prompt"], jnp.asarray(coords), jnp.asarray(labels), cfg)
    pe = dense_pe(params["prompt"], cfg)
    dense_b = no_mask_dense(params["prompt"], cfg, B)  # [B, g, g, C] -> batched
    dense_s = dense_b[0]  # [g, g, C] -> shared

    m_b, iou_b = predict_masks(
        params["decoder"], emb, pe, sparse, cfg, dense_prompts=dense_b
    )
    m_s, iou_s = predict_masks(
        params["decoder"], emb, pe, sparse, cfg, dense_prompts=dense_s
    )
    np.testing.assert_allclose(np.asarray(iou_s), np.asarray(iou_b), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_b), atol=1e-4, rtol=1e-4)


def test_predict_points_end_to_end(sam_pair, rng):
    model, cfg, params = sam_pair
    img = rng.integers(0, 255, (cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    pre = sam_mod.preprocess(jnp.asarray(img), cfg)
    embedding = sam_mod.encode({"encoder": params["encoder"]}, pre, cfg)
    coords = rng.random((3, 1, 2), dtype=np.float32) * cfg.img_size
    labels = np.ones((3, 1), np.float32)
    masks, iou = sam_mod.predict_points(
        params, embedding, jnp.asarray(coords), jnp.asarray(labels), cfg
    )
    assert masks.shape == (3, 3, 4 * cfg.embed_grid, 4 * cfg.embed_grid)
    assert iou.shape == (3, 3)

    with torch.no_grad():
        mean = torch.tensor(cfg.pixel_mean).view(-1, 1, 1)
        std = torch.tensor(cfg.pixel_std).view(-1, 1, 1)
        t_in = (torch.from_numpy(img).permute(2, 0, 1) - mean) / std
        t_emb = model.image_encoder(t_in[None])[0]
        t_sparse = model.prompt_encoder.embed_points(
            torch.from_numpy(coords), torch.from_numpy(labels)
        )
        t_dense = (
            model.prompt_encoder.no_mask_embed.weight[0]
            .reshape(1, -1, 1, 1)
            .expand(3, -1, cfg.embed_grid, cfg.embed_grid)
        )
        t_masks, t_iou = model.mask_decoder(
            t_emb, model.prompt_encoder.dense_pe(), t_sparse, t_dense
        )
    np.testing.assert_allclose(np.asarray(iou), t_iou.numpy(), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(masks), t_masks.numpy(), atol=2e-3, rtol=2e-3)


def test_bf16_scores_knob_close_to_f32(sam_pair, rng, monkeypatch):
    """bf16 score storage (the bf16-serving default) stays within
    bf16-roundoff of the HYBRIDGL_F32_SCORES=1 opt-out path."""
    _, cfg, params = sam_pair
    from hybridgl_tpu.core.params import cast_pytree

    img = rng.standard_normal((1, cfg.img_size, cfg.img_size, 3), dtype=np.float32)
    enc_bf16 = cast_pytree(params["encoder"], jnp.bfloat16)
    x = jnp.asarray(img, jnp.bfloat16)

    monkeypatch.setenv("HYBRIDGL_F32_SCORES", "1")
    base = np.asarray(encode_image(enc_bf16, x, cfg), np.float32)
    monkeypatch.delenv("HYBRIDGL_F32_SCORES", raising=False)
    fast = np.asarray(encode_image(enc_bf16, x, cfg), np.float32)

    # outputs are LayerNorm'd; absolute tolerance in units of the ~1 scale
    assert np.max(np.abs(base - fast)) < 0.15
    assert np.mean(np.abs(base - fast)) < 0.02
