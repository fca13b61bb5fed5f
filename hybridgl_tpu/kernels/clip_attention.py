"""Fused CLIP-block self-attention (Pallas): per-crop scores in VMEM.

The hybrid fusion stage (models/clip/fusion.py) runs 12 ViT-B/16 blocks
over up to 2P = 128 crop streams of L = 197 tokens. XLA's head-split score
einsums want the projected tensors head-major, so every block pays
[N, L, D] relayout copies ({2,1,0} <-> {2,0,1}) plus an elementwise
residual fusion stuck in the transposed layout — the dominant non-matmul
cost in the fusion trace (tools/bench_fusion.py BENCH_TRACE; the same
disease the SAM windowed blocks had, kernels/flash_attention.py).

Layout trick (v2 — measured): padding the projected q/k/v tensors to
128-lane head groups with explicit pad ops costs more than the relayouts
it saves (three [N, 256, 1536] materialisations + a pallas operand copy).
Instead the padding is folded into the IN-PROJECTION WEIGHTS
(:func:`pad_in_proj`): columns are reordered head-major and zero-padded so
the qkv matmul itself emits [N, L, H*3*lane] with every per-head q/k/v
slice 128-lane aligned — no pad, no reshape, no copy, and the q scale
rides in the weight columns. The kernel computes one crop's scores +
CLS-row bias + softmax + PV per program without leaving VMEM and writes a
[N, L, H*lane] context consumed directly by a pad-expanded out-projection
(:func:`pad_heads_proj`).

The only attention bias the fusion modes use is a CLS-ROW mask: reference
``make_attn_mask`` (reference: model/backbone.py:108-115) restricts query
row 0 to in-mask patches and leaves every other row unrestricted — it
arrives compact as [N, L] (models/clip/fusion.py:make_cls_bias).

Softmax runs in f32 (scores never hit HBM, so the bf16 score-storage
policy of core/dtypes.py does not apply — there is nothing to store).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# single-tile q-row limit: above this the XLA path is used (the CLIP
# sequences this kernel serves are 197 tokens; GEM's 785-token self-self
# attention has different math and does not route here)
MAX_ROWS = 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _attn_kernel(qkv_ref, b_ref, o_ref, *, num_heads: int, lane: int):
    """One program = one crop. qkv_ref: [1, L, H*3*lane] head-major padded
    groups (q pre-scaled via the weights); b_ref: [1, 2, L] f32 — row 0 =
    CLS-row bias, row 1 = all-rows bias; o_ref: [1, L, H*lane]."""
    bias = b_ref[0, 1:2, :] + jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (qkv_ref.shape[1], 1), 0) == 0,
        b_ref[0, 0:1, :],
        0.0,
    )  # [L, L] via broadcast
    g = 3 * lane
    for h in range(num_heads):
        lo = h * g
        q = qkv_ref[0][:, lo : lo + lane]  # [L, lane]
        k = qkv_ref[0][:, lo + lane : lo + 2 * lane]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [L, L]
        s = s + bias
        m = s.max(axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / p.sum(axis=1, keepdims=True)
        v = qkv_ref[0][:, lo + 2 * lane : lo + 3 * lane]
        o_ref[0, :, h * lane : (h + 1) * lane] = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def clip_attention(
    qkv: jax.Array,  # [N, L, H*3*lane] from the PADDED in-projection
    cls_bias: jax.Array | None,  # [N, L] f32 additive bias for query row 0
    num_heads: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Multi-head self-attention over short sequences (L <= MAX_ROWS),
    whole-row softmax in VMEM. ``qkv`` must come from a :func:`pad_in_proj`
    projection (head-major 128-lane groups, q pre-scaled). Returns the
    PRE-out-projection context [N, L, H*lane]; consume the head padding
    with :func:`pad_heads_proj`."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    N, L, cols = qkv.shape
    assert L <= MAX_ROWS, (L, MAX_ROWS)
    lane = cols // (3 * num_heads)
    HL = num_heads * lane

    if cls_bias is None:
        row0 = jnp.zeros((N, L), jnp.float32)
    else:
        row0 = cls_bias.astype(jnp.float32)
    b = jnp.stack([row0, jnp.zeros((N, L), jnp.float32)], axis=1)  # [N, 2, L]

    kernel = functools.partial(_attn_kernel, num_heads=num_heads, lane=lane)
    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, L, cols), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 2, L), lambda n: (n, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, HL), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, L, HL), qkv.dtype),
        interpret=interpret,
    )(qkv, b)


def clip_lane(head_dim: int, interpret: bool) -> int:
    """The per-head stride of the padded projections."""
    return head_dim if interpret else _round_up(head_dim, 128)


def pad_in_proj(in_proj_w: jax.Array, in_proj_b: jax.Array, num_heads: int, lane: int):
    """Reorder + zero-pad the packed [D, 3D] in-projection to the kernel's
    head-major layout [D, H*3*lane] (per head: q | k | v, each ``lane``
    columns) with the 1/sqrt(hd) score scale folded into the q columns.
    Weight-only; exact."""
    in_proj_w = jnp.asarray(in_proj_w)
    in_proj_b = jnp.asarray(in_proj_b)
    D, three_d = in_proj_w.shape
    hd = three_d // 3 // num_heads
    scale = jnp.asarray(hd**-0.5, jnp.float32)
    w = in_proj_w.reshape(D, 3, num_heads, hd)
    b = in_proj_b.reshape(3, num_heads, hd)
    w = w.at[:, 0].multiply(scale.astype(w.dtype))
    b = b.at[0].multiply(scale.astype(b.dtype))
    w = jnp.transpose(w, (0, 2, 1, 3))  # [D, H, 3, hd]
    b = jnp.transpose(b, (1, 0, 2))  # [H, 3, hd]
    if lane != hd:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, lane - hd)))
        b = jnp.pad(b, ((0, 0), (0, 0), (0, lane - hd)))
    return w.reshape(D, num_heads * 3 * lane), b.reshape(num_heads * 3 * lane)


def pad_heads_proj(out_w: jax.Array, num_heads: int, lane: int) -> jax.Array:
    """Expand out-projection rows [H*hd, D] -> [H*lane, D] (zero rows under
    the pad lanes) so the projection consumes the kernel's padded context
    directly."""
    Da, D = out_w.shape
    hd = Da // num_heads
    if lane == hd:
        return out_w
    w = out_w.reshape(num_heads, hd, D)
    w = jnp.pad(w, ((0, 0), (0, lane - hd), (0, 0)))
    return w.reshape(num_heads * lane, D)
