"""IoU metrics: device-side accumulators, psum-ready for data parallelism.

The reference accumulates cumulative I/U plus a per-sample IoU list in
driver locals (reference: utils.py:365-384, Hybridgl_main.py:52-55).
Here the accumulator is an explicit pytree that (a) lives on device,
(b) psum-reduces across a mesh axis for multi-chip eval, and (c) exactly
reproduces oIoU / mIoU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class IoUAccum(NamedTuple):
    cum_i: jax.Array  # scalar f64-ish (f32 is plenty for <= 10^10 px)
    cum_u: jax.Array
    sum_iou: jax.Array
    count: jax.Array

    @staticmethod
    def zeros():
        z = jnp.zeros((), jnp.float32)
        return IoUAccum(z, z, z, z)

    @property
    def overall_iou(self):
        return self.cum_i / self.cum_u

    @property
    def mean_iou(self):
        return self.sum_iou / self.count


def mask_iou(pred: jax.Array, target: jax.Array):
    """(I, U, IoU) of two boolean masks (reference Compute_IoU math,
    utils.py:365-384; U==0 -> IoU 0)."""
    p = pred.astype(bool)
    t = target.astype(bool)
    i = jnp.logical_and(p, t).sum().astype(jnp.float32)
    u = jnp.logical_or(p, t).sum().astype(jnp.float32)
    iou = jnp.where(u == 0, 0.0, i / jnp.maximum(u, 1.0))
    return i, u, iou


def update(acc: IoUAccum, pred: jax.Array, target: jax.Array) -> tuple[jax.Array, IoUAccum]:
    i, u, iou = mask_iou(pred, target)
    return iou, IoUAccum(acc.cum_i + i, acc.cum_u + u, acc.sum_iou + iou, acc.count + 1.0)


def update_masked(acc: IoUAccum, pred, target, enabled) -> IoUAccum:
    """Conditional update (for padded sentences in batched eval)."""
    i, u, iou = mask_iou(pred, target)
    e = jnp.asarray(enabled, jnp.float32)
    return IoUAccum(
        acc.cum_i + e * i, acc.cum_u + e * u, acc.sum_iou + e * iou, acc.count + e
    )


def psum_accum(acc: IoUAccum, axis_name: str) -> IoUAccum:
    """Cross-chip reduction — the only collective eval needs (ICI-cheap)."""
    return IoUAccum(*(jax.lax.psum(x, axis_name) for x in acc))


def compute_iou(pred, target, cum_i=0.0, cum_u=0.0, mean_iou=None):
    """Signature-compatible helper for users migrating from the reference's
    ``Compute_IoU`` (utils.py:365-384): returns
    (this_iou, mean_iou_list, cum_i, cum_u). Note the reference's mutable
    default argument is NOT reproduced — pass your own list."""
    import numpy as np

    if mean_iou is None:
        mean_iou = []
    p = np.asarray(pred).astype(bool)
    t = np.asarray(target).astype(bool)
    if t.ndim == p.ndim + 1:
        t = t.squeeze(0)
    i = float(np.logical_and(p, t).sum())
    u = float(np.logical_or(p, t).sum())
    this_iou = 0.0 if u == 0 else i / u
    mean_iou.append(this_iou)
    return this_iou, mean_iou, cum_i + i, cum_u + u


def report(acc: IoUAccum) -> dict:
    return {
        "oIoU": float(acc.overall_iou) * 100.0,
        "mIoU": float(acc.mean_iou) * 100.0,
        "count": int(acc.count),
    }


def a_is_part_of_b(result_seg, this_seg) -> bool:
    """Containment predicate (reference: utils.py:386-395, unused by the
    shipped drivers but part of the utility surface): A is 'part of' B when
    at least 90% of A lies inside B and their IoU exceeds 0.5."""
    import numpy as np

    a = np.asarray(result_seg).astype(bool)
    b = np.asarray(this_seg).astype(bool)
    i = np.logical_and(a, b).sum()
    u = np.logical_or(a, b).sum()
    a_sum = max(int(a.sum()), 1)
    contained = 1.0 - np.logical_and(b, a).sum() / a_sum < 0.1
    return bool(contained and u > 0 and i / u > 0.5)
