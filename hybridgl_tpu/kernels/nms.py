"""Greedy box NMS as a fixed-shape XLA program.

Replaces torchvision ``batched_nms`` (used by the reference AMG,
reference: automatic_mask_generator.py:214,251) with a device-resident
O(N^2) IoU matrix + sequential suppression sweep. N is the static
candidate bucket (a few hundred), so the quadratic matrix is tiny and the
sweep compiles to a single fori_loop — no host sync, no dynamic shapes.

Matches torchvision semantics: descending-score order, suppress when
IoU > threshold (strict), kept indices returned in score order.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .masks import box_iou_matrix

NEG = jnp.float32(-1e30)


class NmsResult(NamedTuple):
    order: jax.Array  # [N] candidate indices sorted by descending score
    keep_sorted: jax.Array  # [N] bool, aligned with `order`
    num_kept: jax.Array  # scalar int32


def nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float,
    valid: jax.Array | None = None,
    unroll: int = 8,
) -> NmsResult:
    """boxes: [N, 4] XYXY; scores: [N]; valid: [N] bool (padding mask).

    The greedy sweep is inherently sequential in the candidate order;
    ``unroll`` trades compiled code size for fewer While-loop iterations
    (device While steps carry scheduling overhead).
    """
    N = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((N,), bool)
    s = jnp.where(valid, scores, NEG)
    order = jnp.argsort(-s)
    b = boxes[order]
    iou = box_iou_matrix(b, b)
    # CRITICAL: materialize the IoU matrix before the sequential sweep.
    # Without the barrier XLA fuses the whole upstream producer chain
    # (boxes come from [P, H, W] mask reductions) into the While body and
    # recomputes it every iteration — measured 0.4ms -> 210ms on the full
    # AMG program.
    iou, order = jax.lax.optimization_barrier((iou, order))
    idx = jnp.arange(N)

    def step(i, suppressed):
        row = (iou[i] > iou_threshold) & (idx > i) & jnp.logical_not(suppressed[i])
        return suppressed | row

    suppressed = jnp.zeros((N,), bool)
    if unroll >= N:
        for i in range(N):
            suppressed = step(i, suppressed)
    else:
        k = max(1, unroll)
        n_outer = (N + k - 1) // k

        def body(o, sup):
            for j in range(k):
                i = o * k + j
                sup = jax.lax.cond(i < N, lambda s: step(i, s), lambda s: s, sup)
            return sup

        suppressed = jax.lax.fori_loop(0, n_outer, body, suppressed)
    keep_sorted = ~suppressed & valid[order]
    return NmsResult(order, keep_sorted, keep_sorted.sum().astype(jnp.int32))


def kept_in_score_order(res: NmsResult, max_out: int) -> tuple[jax.Array, jax.Array]:
    """First ``max_out`` kept candidate indices in descending-score order
    (the order torchvision nms + MaskData.filter imposes downstream),
    plus a validity mask. Dropped candidates beyond ``max_out`` are cut —
    callers should size the bucket generously."""
    # stable sort: kept first, preserving score order
    pos = jnp.argsort(jnp.logical_not(res.keep_sorted), stable=True)
    gathered = res.order[pos][:max_out]
    valid = jnp.arange(max_out) < res.num_kept
    return gathered, valid
