"""Device-mesh scale-out for the eval pipeline.

The reference is strictly single-device (SURVEY.md section 2.5: its only
"distributed" artifacts are dead detectron2 flags). The TPU-native scaling
axis for a training-free eval pipeline is **data parallelism over ICI**:
images are embarrassingly parallel, and the only cross-chip communication
the whole workload needs is the psum of four IoU accumulator scalars.

This module provides:
  * ``make_mesh`` — a 1D 'dp' mesh (or a 2D ('dp','mp') mesh for
    proposal-axis sharding of the scoring stage);
  * ``build_sharded_eval_step`` — a shard_map'd step: each device runs the
    full per-image pipeline (SAM proposals -> crops -> fusion -> scoring ->
    selection -> IoU) on its shard of the image batch, then psums the
    accumulators. Parameters are replicated (ViT-H fits comfortably
    per-chip); activations never cross chips.

Multi-host note: with a multi-host mesh the same code scales across DCN —
jax.make_mesh handles device order; the batch loader shards by process.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import PipelineConfig
from ..eval.metrics import IoUAccum, mask_iou
from ..kernels.masks import box_xyxy_to_xywh
from ..models.clip.fusion import calculate_score, hybrid_forward
from ..models.clip.text import encode_text
from ..models.sam.amg import generate_proposals
from ..pipeline.guidance import select_candidates
from ..pipeline.preprocess import build_crops


def shard_map_compat(f, *, mesh, in_specs, out_specs):
    """shard_map across jax versions: >= 0.8 moved it out of experimental
    and renamed check_rep -> check_vma. One adapter for every call site."""
    try:
        from jax import shard_map as _sm
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _sm
    try:
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False)
    except TypeError:  # pragma: no cover - jax with shard_map but pre-rename kwarg
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False)


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def make_mesh_2d(n_devices: int | None = None, mp: int = 2) -> Mesh:
    """(dp, mp) mesh: images shard over dp; within an mp group the fusion
    stage shards the proposal axis (model-space parallelism for per-image
    latency). mp groups should map to ICI neighbours."""
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % mp == 0, (n, mp)
    return Mesh(np.array(devices[:n]).reshape(n // mp, mp), ("dp", "mp"))


class EvalBatch(NamedTuple):
    """Stacked per-image arrays, leading axis = global batch (sharded on dp)."""

    image_1024: jax.Array  # [B, S, S, 3] uint8
    rh: jax.Array  # [B]
    rw: jax.Array
    image_canonical: jax.Array  # [B, C, C, 3] uint8
    h: jax.Array  # [B]
    w: jax.Array
    gt_mask: jax.Array  # [B, C, C] bool
    tokens_sentence: jax.Array  # [B, L]
    tokens_np: jax.Array  # [B, L]


def _single_image_step(
    sam_params,
    clip_params,
    sample: EvalBatch,
    cfg: PipelineConfig,
    mp_axis: str | None = None,
):
    """Full pipeline for ONE image (leading axes already squeezed).

    With ``mp_axis``, the fusion stage shards the proposal axis across the
    mp group: each member runs hybrid fusion on P/mp proposals and an
    all_gather reassembles the [P, E] features (the only mp collective —
    a few KB over ICI). Proposal generation is replicated within the group
    (the encoder is one image; sharding it is a different axis).
    """
    sam_cfg, clip_cfg = cfg.sam, cfg.clip
    C = cfg.canonical_size
    props = generate_proposals(
        sam_params,
        sample.image_1024,
        sample.rh,
        sample.rw,
        sample.h,
        sample.w,
        sam_cfg,
        cfg.amg,
        C,
    )
    masks = props.masks
    if mp_axis is not None:
        mp = jax.lax.axis_size(mp_axis)
        idx = jax.lax.axis_index(mp_axis)
        P = masks.shape[0]
        shard = P // mp
        masks = jax.lax.dynamic_slice_in_dim(masks, idx * shard, shard, axis=0)
    glob, local = build_crops(
        sample.image_canonical, masks, (sample.h, sample.w), cfg.crop_size
    )
    feats = hybrid_forward(
        clip_params["visual"],
        local,
        glob,
        masks.astype(jnp.float32),
        clip_cfg,
        fusion_mode=cfg.fusion_mode,
        masking_block=cfg.guidance.masking_block,
        compat=cfg.compat,
        masks_hw=(sample.h, sample.w),
    )
    if mp_axis is not None:
        feats = jax.lax.all_gather(feats, mp_axis, axis=0, tiled=True)
    tf = encode_text(
        clip_params["text"],
        jnp.stack([sample.tokens_sentence, sample.tokens_np]),
        clip_cfg,
    )
    text_ensemble = cfg.guidance.r * tf[0] + (1 - cfg.guidance.r) * tf[1]
    score = calculate_score(feats, text_ensemble[None], clip_params["logit_scale"])[:, 0]
    sel = select_candidates(
        score,
        score,
        box_xyxy_to_xywh(props.boxes_xyxy),
        jnp.zeros_like(score),
        props.valid,
        jnp.asarray(0),
        jnp.asarray(False),
        jnp.asarray(cfg.guidance.k1),
        jnp.asarray(cfg.guidance.k2),
        alpha=cfg.guidance.alpha,
    )
    i, u, iou = mask_iou(props.masks[sel.pure_index], sample.gt_mask)
    return IoUAccum(i, u, iou, jnp.asarray(1.0)), sel.pure_index


def build_sharded_eval_step(
    cfg: PipelineConfig, mesh: Mesh, axis: str = "dp", mp_axis: str | None = None
):
    """Returns jitted ``step(sam_params, clip_params, batch) ->
    (global IoUAccum, per-image selections)``.

    Batch axis is sharded over ``axis``; params are replicated. With a 2D
    (dp, mp) mesh pass ``mp_axis='mp'``: the batch shards over dp only and
    each mp group cooperatively computes its images' fusion stage
    (proposal-axis sharding + all_gather). Collectives: one all_gather of
    [P, E] per image over mp, one psum of four scalars over dp — both
    ICI-cheap.
    """

    def per_device(sam_params, clip_params, batch: EvalBatch):
        # local shard: [b_local, ...] -> scan images sequentially per device
        def body(carry, sample):
            acc = carry
            upd, sel = _single_image_step(
                sam_params, clip_params, sample, cfg, mp_axis=mp_axis
            )
            acc = IoUAccum(*(a + b for a, b in zip(acc, upd)))
            return acc, sel

        acc0 = IoUAccum.zeros()
        acc, sels = jax.lax.scan(body, acc0, batch)
        acc = IoUAccum(*(jax.lax.psum(x, axis) for x in acc))
        return acc, sels


    batch_specs = EvalBatch(*(P(axis) for _ in EvalBatch._fields))
    step = shard_map_compat(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), batch_specs),
        out_specs=(P(), P(axis)),
    )
    return jax.jit(step)


def shard_batch(batch: EvalBatch, mesh: Mesh, axis: str = "dp") -> EvalBatch:
    """Place a host batch with the dp sharding (device_put per leaf)."""
    sharding = NamedSharding(mesh, P(axis))
    return EvalBatch(*(jax.device_put(x, sharding) for x in batch))
