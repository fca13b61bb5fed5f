"""CLIP ModifiedResNet visual encoder (functional JAX).

Completes the reference CLIP surface (reference:
third_party/modified_CLIP/clip/model.py:10-186): the 3-conv stem with
avgpool, anti-aliased strided bottlenecks (avgpool before the strided
conv), and the QKV attention pooling head. Not used by the shipped
drivers (which are ViT-only) but part of the public CLIP model family
(RN50/RN101/...), so users migrating keep it.

BatchNorm runs in inference mode from the checkpoint's running statistics.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EXPANSION = 4


def _conv(x, w, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        (stride, stride),
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"] * inv).astype(x.dtype)
    bias = (p["bias"] - p["mean"] * p["scale"] * inv).astype(x.dtype)
    return x * scale + bias


def _avg_pool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def bottleneck(p, x, stride: int = 1):
    """Reference Bottleneck (clip/model.py:10-53): all convs stride 1, an
    avgpool after conv2 when stride > 1; downsample = avgpool + 1x1 conv."""
    identity = x
    out = jax.nn.relu(_bn(p["bn1"], _conv(x, p["conv1_w"])))
    out = jax.nn.relu(_bn(p["bn2"], _conv(out, p["conv2_w"])))
    if stride > 1:
        out = _avg_pool(out, stride)
    out = _bn(p["bn3"], _conv(out, p["conv3_w"]))
    if "downsample" in p:
        d = p["downsample"]
        identity = x
        if stride > 1:
            identity = _avg_pool(identity, stride)
        identity = _bn(d["bn"], _conv(identity, d["conv_w"]))
    return jax.nn.relu(out + identity)


def attention_pool_2d(p, x, num_heads: int):
    """QKV attention pooling (clip/model.py:56-124, the standard path):
    tokens = [mean, pixels] + positional embedding; output is the pooled
    first token after one MHA with separate projections."""
    N, H, W, C = x.shape
    tokens = x.reshape(N, H * W, C)
    mean = tokens.mean(axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)  # [N, HW+1, C]
    tokens = tokens + p["positional_embedding"].astype(tokens.dtype)

    def lin(name, t):
        return t @ p[name]["w"].astype(t.dtype) + p[name]["b"].astype(t.dtype)

    q = lin("q_proj", tokens[:, :1])  # query: the mean token
    k = lin("k_proj", tokens)
    v = lin("v_proj", tokens)
    L = tokens.shape[1]
    hd = q.shape[-1] // num_heads

    def heads(t, l):
        return t.reshape(N, l, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q, 1), heads(k, L), heads(v, L)
    attn = jnp.einsum(
        "nhqd,nhkd->nhqk", qh, kh, preferred_element_type=jnp.float32
    ) / np.sqrt(hd)
    attn = jax.nn.softmax(attn, axis=-1).astype(tokens.dtype)
    out = jnp.einsum("nhqk,nhkd->nhqd", attn, vh, preferred_element_type=jnp.float32)
    out = out.astype(tokens.dtype).transpose(0, 2, 1, 3).reshape(N, 1, -1)
    return lin("c_proj", out)[:, 0]


def encode_image_resnet(p, images: jax.Array, layers: Sequence[int], heads: int):
    """[N, S, S, 3] -> [N, output_dim] pooled features.

    Param dtype drives the compute dtype (see vit.vit_stem)."""
    x = images.astype(jnp.asarray(p["conv1_w"]).dtype)
    for i in (1, 2, 3):
        x = jax.nn.relu(
            _bn(p[f"bn{i}"], _conv(x, p[f"conv{i}_w"], stride=2 if i == 1 else 1))
        )
    x = _avg_pool(x, 2)
    for li, n_blocks in enumerate(layers, start=1):
        blocks = p[f"layer{li}"]
        for bi in range(n_blocks):
            stride = 2 if (bi == 0 and li > 1) else 1
            x = bottleneck(blocks[bi], x, stride)
    return attention_pool_2d(p["attnpool"], x, heads).astype(jnp.float32)


# ---------------------------------------------------------------------------
# torch state-dict conversion
# ---------------------------------------------------------------------------


def _bn_params(sd, prefix):
    return {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }


def _conv_w(sd, prefix):
    return sd[f"{prefix}.weight"].transpose(2, 3, 1, 0).copy()


def convert_resnet_visual(sd) -> Tuple[dict, Sequence[int], int]:
    """'visual.*' RN state dict (numpy) -> (params, layers, heads)."""
    layers = []
    for li in (1, 2, 3, 4):
        n = len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{li}.")})
        layers.append(n)
    params = {}
    for i in (1, 2, 3):
        params[f"conv{i}_w"] = _conv_w(sd, f"visual.conv{i}")
        params[f"bn{i}"] = _bn_params(sd, f"visual.bn{i}")
    for li, n in enumerate(layers, start=1):
        blocks = []
        for bi in range(n):
            pre = f"visual.layer{li}.{bi}"
            blk = {
                "conv1_w": _conv_w(sd, f"{pre}.conv1"),
                "bn1": _bn_params(sd, f"{pre}.bn1"),
                "conv2_w": _conv_w(sd, f"{pre}.conv2"),
                "bn2": _bn_params(sd, f"{pre}.bn2"),
                "conv3_w": _conv_w(sd, f"{pre}.conv3"),
                "bn3": _bn_params(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv_w": _conv_w(sd, f"{pre}.downsample.0"),
                    "bn": _bn_params(sd, f"{pre}.downsample.1"),
                }
            blocks.append(blk)
        params[f"layer{li}"] = blocks
    ap = "visual.attnpool"
    embed_dim = sd[f"{ap}.k_proj.weight"].shape[1]
    heads = embed_dim * 1 // 64  # vision_heads = width*32/64 (model.py:331)
    params["attnpool"] = {
        "positional_embedding": sd[f"{ap}.positional_embedding"],
        **{
            name: {
                "w": sd[f"{ap}.{name}.weight"].T.copy(),
                "b": sd[f"{ap}.{name}.bias"],
            }
            for name in ("q_proj", "k_proj", "v_proj", "c_proj")
        },
    }
    return params, layers, heads
