"""Tensor-parallel SAM image encoder over a mesh axis.

Megatron-style sharding of the pipeline's hottest single-image stage
(~140 ms of the ~300 ms device time per image on one v5e): each block's
attention shards by HEAD GROUPS (qkv column-sharded, output projection
row-sharded) and its MLP by the hidden dimension (fc column-sharded, proj
row-sharded), so one ``lax.psum`` per half-block is the only collective —
the classic layout that rides ICI with all matmuls still MXU-shaped.
Residual adds and LayerNorms see the full (replicated) activations, which
the psums re-materialise.

The reference has no equivalent (strictly single-GPU); this is the
TPU-native latency axis for serving: mesh ('dp', 'mp') where dp shards
images (parallel/mesh.py, parallel/full_eval.py) and mp accelerates each
image. Validated against the single-device encoder on a virtual mesh
(tests/test_encoder_tp.py) and compile-checked by __graft_entry__'s
multi-chip dryrun.

Params stay in the stacked scan layout (image_encoder.stack_encoder_runs);
each device slices its head/hidden shard at trace time — under jit those
slices fold into the program, so only the shard is ever live per device
when the params are sharded accordingly at placement time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import SamConfig
from ..models.sam.image_encoder import (
    _attention,
    _ln,
    encoder_block,
    window_partition,
    window_runs,
    window_unpartition,
)


def _shard_block_params(bp, cfg: SamConfig, idx, mp: int):
    """Slice one (possibly stacked) block's params to device ``idx``'s head
    and hidden shards. Leading stacked axes pass through untouched."""
    D = cfg.encoder_width
    H = cfg.encoder_heads
    assert H % mp == 0, (H, mp)
    hl = H // mp  # heads per shard
    hd = D // H
    dl = hl * hd  # local attention width
    mlp_h = bp["mlp_fc"]["w"].shape[-1]
    assert mlp_h % mp == 0, (mlp_h, mp)
    ml = mlp_h // mp

    def dslice(a, start, size):
        return jax.lax.dynamic_slice_in_dim(a, start, size, axis=a.ndim - 1)

    def dslice_row(a, start, size):
        return jax.lax.dynamic_slice_in_dim(a, start, size, axis=a.ndim - 2)

    attn = bp["attn"]
    # qkv_w packs [q | k | v] along the output dim; take this shard's head
    # group from each section so the generic split-in-3 block code works
    qkv_w = jnp.concatenate(
        [dslice(attn["qkv_w"], s * D + idx * dl, dl) for s in range(3)], axis=-1
    )
    qkv_b = jnp.concatenate(
        [dslice(attn["qkv_b"], s * D + idx * dl, dl) for s in range(3)], axis=-1
    )
    zero_b = jnp.zeros_like(attn["proj_b"])
    new_attn = {
        "qkv_w": qkv_w,
        "qkv_b": qkv_b,
        # row-shard the output projection; bias added on shard 0 only so
        # the psum reconstructs it exactly once
        "proj_w": dslice_row(attn["proj_w"], idx * dl, dl),
        "proj_b": jnp.where(idx == 0, attn["proj_b"], zero_b),
        "rel_pos_h": attn["rel_pos_h"],  # per-head-dim tables: shared
        "rel_pos_w": attn["rel_pos_w"],
    }
    for k in ("rel_tab_h", "rel_tab_w"):  # precomputed [G, G, hd]: shared too
        if k in attn:
            new_attn[k] = attn[k]
    return {
        "ln_1": bp["ln_1"],
        "ln_2": bp["ln_2"],
        "attn": new_attn,
        "mlp_fc": {
            "w": dslice(bp["mlp_fc"]["w"], idx * ml, ml),
            "b": dslice(bp["mlp_fc"]["b"], idx * ml, ml),
        },
        "mlp_proj": {
            "w": dslice_row(bp["mlp_proj"]["w"], idx * ml, ml),
            "b": jnp.where(idx == 0, bp["mlp_proj"]["b"], jnp.zeros_like(bp["mlp_proj"]["b"])),
        },
    }


def _block_tp(bp_local, x, cfg: SamConfig, window: int, heads_local: int, axis: str):
    """encoder_block with head/hidden-sharded params: psum after the
    attention projection and after the MLP projection."""
    from ..models.sam.image_encoder import _mlp

    shortcut = x
    y = _ln(bp_local["ln_1"], x)
    if window > 0:
        Hh, Ww = y.shape[1], y.shape[2]
        wins, pad_hw = window_partition(y, window)
        wins = _attention(bp_local["attn"], wins, heads_local, window)
        y = window_unpartition(wins, window, pad_hw, (Hh, Ww))
    else:
        y = _attention(bp_local["attn"], y, heads_local, y.shape[1])
    x = shortcut + jax.lax.psum(y, axis)
    return x + jax.lax.psum(_mlp(bp_local, _ln(bp_local["ln_2"], x)), axis)


def encode_image_tp(p_enc, images: jax.Array, cfg: SamConfig, axis: str = "mp"):
    """Tensor-parallel ``encode_image``: call INSIDE shard_map/pjit with a
    mesh axis ``axis``; images replicated across the axis, output
    replicated. Accepts the stacked (``block_runs``) encoder format."""
    from ..models.sam.image_encoder import embed_patches, neck

    mp = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    heads_local = cfg.encoder_heads // mp

    x = embed_patches(p_enc, images, cfg)

    runs = window_runs(cfg)
    for (kind, idxs), rp in zip(runs, p_enc["block_runs"]):
        window = 0 if kind == "global" else cfg.window_size
        if len(idxs) == 1:
            local = _shard_block_params(rp, cfg, idx, mp)
            x = _block_tp(local, x, cfg, window, heads_local, axis)
        else:

            def body(h, bp):
                local = _shard_block_params(bp, cfg, idx, mp)
                return _block_tp(local, h, cfg, window, heads_local, axis), None

            x, _ = jax.lax.scan(body, x, rp)

    return neck(p_enc, x)
