"""Parameter pytree construction (random init) + pytree utilities.

Layouts correspond 1:1 to the reference checkpoints the converter maps
(reference: third_party/modified_CLIP/clip/model.py state dict and
third_party/segment-anything .pth layout — see core/convert.py).

Param layouts are documented here once and shared by the random init, the
torch checkpoint converter (core/convert.py) and the orbax checkpointer
(core/checkpoint.py). All weight matrices are stored input-major
([D_in, D_out]) so forward passes are plain ``x @ w``.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .config import ClipConfig, SamConfig


def _keys(key: jax.Array) -> Iterator[jax.Array]:
    while True:
        key, sub = jax.random.split(key)
        yield sub


def _ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _linear(ks, d_in, d_out, std=None):
    std = std if std is not None else d_in**-0.5
    return {
        "w": jax.random.normal(next(ks), (d_in, d_out), jnp.float32) * std,
        "b": jnp.zeros((d_out,), jnp.float32),
    }


def _attn(ks, d):
    return {
        "in_proj_w": jax.random.normal(next(ks), (d, 3 * d), jnp.float32) * d**-0.5,
        "in_proj_b": jnp.zeros((3 * d,), jnp.float32),
        "out_w": jax.random.normal(next(ks), (d, d), jnp.float32) * d**-0.5,
        "out_b": jnp.zeros((d,), jnp.float32),
    }


def _resblock(ks, d):
    return {
        "ln_1": _ln(d),
        "attn": _attn(ks, d),
        "ln_2": _ln(d),
        "mlp_fc": _linear(ks, d, 4 * d),
        "mlp_proj": _linear(ks, 4 * d, d),
    }


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------


def init_clip(key: jax.Array, cfg: ClipConfig):
    ks = _keys(key)
    vw, tw = cfg.vision_width, cfg.text_width
    visual = {
        "conv1": jax.random.normal(
            next(ks), (cfg.patch_size, cfg.patch_size, 3, vw), jnp.float32
        )
        * vw**-0.5,
        "class_embedding": jax.random.normal(next(ks), (vw,), jnp.float32) * vw**-0.5,
        "positional_embedding": jax.random.normal(next(ks), (cfg.seq_len, vw), jnp.float32)
        * vw**-0.5,
        "ln_pre": _ln(vw),
        "blocks": [_resblock(ks, vw) for _ in range(cfg.vision_layers)],
        "ln_post": _ln(vw),
        "proj": jax.random.normal(next(ks), (vw, cfg.embed_dim), jnp.float32) * vw**-0.5,
    }
    text = {
        "token_embedding": jax.random.normal(next(ks), (cfg.vocab_size, tw), jnp.float32)
        * 0.02,
        "positional_embedding": jax.random.normal(
            next(ks), (cfg.context_length, tw), jnp.float32
        )
        * 0.01,
        "blocks": [_resblock(ks, tw) for _ in range(cfg.text_layers)],
        "ln_final": _ln(tw),
        "text_projection": jax.random.normal(next(ks), (tw, cfg.embed_dim), jnp.float32)
        * tw**-0.5,
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }


# ---------------------------------------------------------------------------
# SAM
# ---------------------------------------------------------------------------


def _sam_enc_block(ks, cfg: SamConfig, window: int):
    d = cfg.encoder_width
    hd = d // cfg.encoder_heads
    size = window if window > 0 else cfg.embed_grid
    return {
        "ln_1": _ln(d),
        "attn": {
            "qkv_w": jax.random.normal(next(ks), (d, 3 * d), jnp.float32) * d**-0.5,
            "qkv_b": jnp.zeros((3 * d,), jnp.float32),
            "proj_w": jax.random.normal(next(ks), (d, d), jnp.float32) * d**-0.5,
            "proj_b": jnp.zeros((d,), jnp.float32),
            "rel_pos_h": jnp.zeros((2 * size - 1, hd), jnp.float32),
            "rel_pos_w": jnp.zeros((2 * size - 1, hd), jnp.float32),
        },
        "ln_2": _ln(d),
        "mlp_fc": _linear(ks, d, int(d * cfg.mlp_ratio)),
        "mlp_proj": _linear(ks, int(d * cfg.mlp_ratio), d),
    }


def _mlp_stack(ks, dims):
    return [
        _linear(ks, dims[i], dims[i + 1]) for i in range(len(dims) - 1)
    ]


def _twoway_attn(ks, d, downsample=1):
    di = d // downsample
    return {
        "q": _linear(ks, d, di),
        "k": _linear(ks, d, di),
        "v": _linear(ks, d, di),
        "out": _linear(ks, di, d),
    }


def _twoway_block(ks, cfg: SamConfig):
    d = cfg.prompt_dim
    return {
        "self_attn": _twoway_attn(ks, d),
        "norm1": _ln(d),
        "cross_t2i": _twoway_attn(ks, d, 2),
        "norm2": _ln(d),
        "mlp_fc": _linear(ks, d, cfg.decoder_mlp_dim),
        "mlp_proj": _linear(ks, cfg.decoder_mlp_dim, d),
        "norm3": _ln(d),
        "norm4": _ln(d),
        "cross_i2t": _twoway_attn(ks, d, 2),
    }


def init_sam(key: jax.Array, cfg: SamConfig):
    ks = _keys(key)
    d = cfg.encoder_width
    pd = cfg.prompt_dim
    g = cfg.embed_grid
    encoder = {
        "patch_embed": {
            "w": jax.random.normal(
                next(ks), (cfg.patch_size, cfg.patch_size, 3, d), jnp.float32
            )
            * d**-0.5,
            "b": jnp.zeros((d,), jnp.float32),
        },
        "pos_embed": jnp.zeros((1, g, g, d), jnp.float32),
        "blocks": [
            _sam_enc_block(
                ks, cfg, 0 if i in cfg.encoder_global_idx else cfg.window_size
            )
            for i in range(cfg.encoder_depth)
        ],
        "neck": {
            "conv1_w": jax.random.normal(next(ks), (1, 1, d, pd), jnp.float32) * d**-0.5,
            "ln1": _ln(pd),
            "conv2_w": jax.random.normal(next(ks), (3, 3, pd, pd), jnp.float32)
            * (9 * pd) ** -0.5,
            "ln2": _ln(pd),
        },
    }
    prompt = {
        "pe_gaussian": jax.random.normal(next(ks), (2, pd // 2), jnp.float32),
        "point_embeddings": jax.random.normal(next(ks), (4, pd), jnp.float32),
        "not_a_point_embed": jax.random.normal(next(ks), (pd,), jnp.float32),
        "no_mask_embed": jax.random.normal(next(ks), (pd,), jnp.float32),
        "mask_downscaling": {
            "conv1": {
                "w": jax.random.normal(
                    next(ks), (2, 2, 1, cfg.mask_in_chans // 4), jnp.float32
                ),
                "b": jnp.zeros((cfg.mask_in_chans // 4,), jnp.float32),
            },
            "ln1": _ln(cfg.mask_in_chans // 4),
            "conv2": {
                "w": jax.random.normal(
                    next(ks),
                    (2, 2, cfg.mask_in_chans // 4, cfg.mask_in_chans),
                    jnp.float32,
                ),
                "b": jnp.zeros((cfg.mask_in_chans,), jnp.float32),
            },
            "ln2": _ln(cfg.mask_in_chans),
            "conv3": {
                "w": jax.random.normal(
                    next(ks), (1, 1, cfg.mask_in_chans, pd), jnp.float32
                ),
                "b": jnp.zeros((pd,), jnp.float32),
            },
        },
    }
    nmt = cfg.num_mask_tokens
    decoder = {
        "iou_token": jax.random.normal(next(ks), (1, pd), jnp.float32),
        "mask_tokens": jax.random.normal(next(ks), (nmt, pd), jnp.float32),
        "transformer": {
            "layers": [_twoway_block(ks, cfg) for _ in range(cfg.decoder_depth)],
            "final_attn": _twoway_attn(ks, pd, 2),
            "norm_final": _ln(pd),
        },
        "upscale": {
            # ConvTranspose2d kernels stored HWIO ([kh, kw, in, out])
            "deconv1": {
                "w": jax.random.normal(next(ks), (2, 2, pd, pd // 4), jnp.float32)
                * pd**-0.5,
                "b": jnp.zeros((pd // 4,), jnp.float32),
            },
            "ln": _ln(pd // 4),
            "deconv2": {
                "w": jax.random.normal(next(ks), (2, 2, pd // 4, pd // 8), jnp.float32)
                * pd**-0.5,
                "b": jnp.zeros((pd // 8,), jnp.float32),
            },
        },
        "hyper_mlps": [
            _mlp_stack(ks, [pd, pd, pd, pd // 8]) for _ in range(nmt)
        ],
        "iou_head": _mlp_stack(
            ks, [pd] + [cfg.iou_head_hidden] * (cfg.iou_head_depth - 1) + [nmt]
        ),
    }
    return {"encoder": encoder, "prompt": prompt, "decoder": decoder}


# ---------------------------------------------------------------------------
# utilities
# ---------------------------------------------------------------------------


def cast_pytree(tree, dtype):
    """Cast floating leaves to ``dtype`` (e.g. bf16 for TPU serving)."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def param_count(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def stack_block_params(blocks):
    """[per-block param dicts] -> one pytree with a leading depth axis.

    The canonical scan-ready weight layout (docs/DESIGN.md "Weight
    layout"): XLA streams one stacked buffer per weight via
    double-buffered dynamic-slice instead of a small DMA per block per
    call. Consumers: clip/layers.py:scan_blocks,
    sam/image_encoder.py:stack_encoder_runs.
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
