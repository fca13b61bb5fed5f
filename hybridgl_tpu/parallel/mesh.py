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


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


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


def _single_image_step(sam_params, clip_params, sample: EvalBatch, cfg: PipelineConfig):
    """Full pipeline for ONE image (leading axes already squeezed)."""
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
    glob, local = build_crops(
        sample.image_canonical, props.masks, (sample.h, sample.w), cfg.crop_size
    )
    feats = hybrid_forward(
        clip_params["visual"],
        local,
        glob,
        props.masks.astype(jnp.float32),
        clip_cfg,
        fusion_mode=cfg.fusion_mode,
        masking_block=cfg.guidance.masking_block,
        compat=cfg.compat,
        masks_hw=(sample.h, sample.w),
    )
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


def build_sharded_eval_step(cfg: PipelineConfig, mesh: Mesh, axis: str = "dp"):
    """Returns jitted ``step(sam_params, clip_params, batch) ->
    (global IoUAccum, per-image selections)``.

    Batch axis is sharded over ``axis``; params are replicated; the psum of
    the accumulator is the only collective.
    """

    def per_device(sam_params, clip_params, batch: EvalBatch):
        # local shard: [b_local, ...] -> scan images sequentially per device
        def body(carry, sample):
            acc = carry
            upd, sel = _single_image_step(sam_params, clip_params, sample, cfg)
            acc = IoUAccum(*(a + b for a, b in zip(acc, upd)))
            return acc, sel

        acc0 = IoUAccum.zeros()
        acc, sels = jax.lax.scan(body, acc0, batch)
        acc = IoUAccum(*(jax.lax.psum(x, axis) for x in acc))
        return acc, sels

    from jax.experimental.shard_map import shard_map

    batch_specs = EvalBatch(*(P(axis) for _ in EvalBatch._fields))
    step = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), batch_specs),
        out_specs=(P(), P(axis)),
        check_rep=False,
    )
    return jax.jit(step)


def shard_batch(batch: EvalBatch, mesh: Mesh, axis: str = "dp") -> EvalBatch:
    """Place a host batch with the dp sharding (device_put per leaf)."""
    sharding = NamedSharding(mesh, P(axis))
    return EvalBatch(*(jax.device_put(x, sharding) for x in batch))
