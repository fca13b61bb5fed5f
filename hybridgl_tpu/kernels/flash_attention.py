"""Pallas flash attention with decomposed relative-position bias.

The SAM image encoder's four global-attention blocks attend over
64x64 = 4096 tokens per head; materialising the [heads, 4096, 4096]
attention matrix costs ~1 GB of HBM traffic per block. This kernel
computes attention with online softmax in VMEM tiles, and folds the
decomposed rel-pos bias (reference math:
third_party/segment-anything/segment_anything/modeling/image_encoder.py:325-361)
into the tile loop without materialising it:

  bias[q, k] = rel_h[q, k // G] + rel_w[q, k % G]      (G = grid side)

The two rank-G terms (rel_h = einsum(q, Rh), rel_w = einsum(q, Rw)) are
tiny ([S, G]) and precomputed outside; inside the kernel a [TQ, TK] bias
tile is rebuilt from a [TQ, TK/G] slice of rel_h plus the [TQ, G] rel_w —
pure VPU adds, no extra HBM traffic.

Key layout choices (see pallas_guide.md):
  * k-tile = TK = n*G columns => a tile covers whole grid rows, so the
    bias tile is a concat of n shifted rel_h columns + rel_w;
  * running max/denominator/accumulator live in VMEM scratch across the
    k-tile grid dimension; output written at the last k tile;
  * softmax statistics in f32 regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, m_scr, l_scr, acc_scr, *, rows_per_ktile: int, grid_side: int, nk: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [TQ, hd] (pre-scaled)
    k = k_ref[0]  # [TK, hd]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [TQ, TK]

    # rel_h arrives transposed ([rows_per_ktile, TQ] tile) so the lane dim
    # is TQ (128-aligned); one small transpose rebuilds the [TQ, ...] view
    rh = rh_ref[0].astype(jnp.float32).T  # [TQ, rows_per_ktile]
    rw = rw_ref[0].astype(jnp.float32)  # [TQ, G]
    bias = jnp.concatenate(
        [rh[:, r : r + 1] + rw for r in range(rows_per_ktile)], axis=1
    )  # [TQ, TK]
    s = s + bias

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_scr[:] = l_scr[:] * alpha + p.sum(axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_scr[:] = m_new

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("grid_side", "block_q", "block_k", "interpret"))
def flash_attention_rel_pos(
    q: jax.Array,  # [BH, S, hd], S = grid_side**2 (pre-scaled by 1/sqrt(hd))
    k: jax.Array,
    v: jax.Array,
    rel_h: jax.Array,  # [BH, S, grid_side] bias term for the k-row axis
    rel_w: jax.Array,  # [BH, S, grid_side] bias term for the k-col axis
    grid_side: int,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    if interpret is None:
        # pallas requires interpret mode off-TPU (keeps CPU tests working)
        interpret = jax.default_backend() == "cpu"
    BH, S, hd = q.shape
    G = grid_side
    assert S == G * G, (S, G)
    assert block_k % G == 0, "k tile must cover whole grid rows"
    rows_per_ktile = block_k // G
    # the transposed rel_h tile is [rows_per_ktile, TQ]: on real TPUs the
    # sublane dim needs >= 8 rows ((8,128) tiling) unless it spans the full
    # G; interpret mode (tests with tiny grids) has no such constraint
    if not interpret:
        assert rows_per_ktile >= 8 or rows_per_ktile == G, (
            f"block_k={block_k} too small for grid_side={G}: need block_k >= 8*G"
        )
    assert S % block_q == 0 and S % block_k == 0
    nq = S // block_q
    nk = S // block_k

    kernel = functools.partial(
        _flash_kernel, rows_per_ktile=rows_per_ktile, grid_side=G, nk=nk
    )
    grid = (BH, nq, nk)
    rel_h_t = rel_h.transpose(0, 2, 1)  # [BH, G, S]: lane dim = S (aligned)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec(
                (1, rows_per_ktile, block_q), lambda b, qi, ki: (b, ki, qi)
            ),
            pl.BlockSpec((1, block_q, G), lambda b, qi, ki: (b, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, S, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, rel_h_t, rel_w)


def _flash_aug_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, nk: int):
    """Tiled online-softmax attention whose score matmul ALREADY contains
    the rel-pos bias (augmented contraction — see flash_attention_fused).
    The body is a plain flash tile: one aligned MXU dot, no bias rebuild."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [TQ, lane] augmented (pre-scaled q | rel_h | rel_w | 0)
    k = k_ref[0]  # [TK, lane] augmented (k | one_hot(kh) | one_hot(kw) | 0)
    v = v_ref[0]  # [TK, lane_v]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # scores + bias

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_scr[:] = l_scr[:] * alpha + p.sum(axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_scr[:] = m_new

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("grid_side", "block_q", "block_k", "interpret")
)
def flash_attention_fused(
    q: jax.Array,  # [BH, S, hd], S = grid_side**2, PRE-SCALED by 1/sqrt(hd)
    k: jax.Array,
    v: jax.Array,
    rel_h: jax.Array,  # [BH, S, grid_side] bias term for the k-row axis
    rel_w: jax.Array,  # [BH, S, grid_side] bias term for the k-col axis
    grid_side: int,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """Global-block flash attention with the decomposed rel-pos bias folded
    into the score contraction (same augmentation as flash_windowed_fused,
    but tiled with online softmax because S = 4096 scores don't fit VMEM).

    q is augmented with its two rel terms and k with the static kh/kw
    one-hots, so ``q_aug . k_aug`` = scores + bias in ONE K-aligned MXU dot
    (lane = round_up(hd + 2G, 128) = 256 for ViT-H globals). The previous
    kernel (flash_attention_rel_pos) contracted over the raw hd = 80 lanes
    and rebuilt the bias tile from a transposed rel_h slice + G concats per
    (q, k) tile — measured 10.4 ms/call for the 4 ViT-H global blocks vs
    ~2 ms for this form (reference math: image_encoder.py:325-361).

    Returns [BH, S, lane_v] with lane_v = round_up(hd, 128): each row's
    first hd lanes are the attention output, the rest zeros — consume with
    :func:`pad_windowed_proj` rows to skip the repack copy.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    BH, S, hd = q.shape
    G = grid_side
    assert S == G * G, (S, G)
    assert S % block_q == 0 and S % block_k == 0
    nq = S // block_q
    nk = S // block_k
    dt = q.dtype
    lane = _round_up(hd + 2 * G, 128) if not interpret else hd + 2 * G
    lane_v = _round_up(hd, 128) if not interpret else hd

    pos = np.arange(S)
    KH = jnp.asarray(np.eye(G, dtype=np.float32)[pos // G], dt)  # [S, G]
    KW = jnp.asarray(np.eye(G, dtype=np.float32)[pos % G], dt)
    sel = jnp.broadcast_to(
        jnp.concatenate([KH, KW], axis=-1)[None], (BH, S, 2 * G)
    )
    q_aug = jnp.concatenate([q, rel_h.astype(dt), rel_w.astype(dt)], axis=-1)
    k_aug = jnp.concatenate([k, sel], axis=-1)
    pad = lane - (hd + 2 * G)
    if pad:
        q_aug = jnp.pad(q_aug, ((0, 0), (0, 0), (0, pad)))
        k_aug = jnp.pad(k_aug, ((0, 0), (0, 0), (0, pad)))
    v_p = jnp.pad(v, ((0, 0), (0, 0), (0, lane_v - hd))) if lane_v != hd else v

    kernel = functools.partial(_flash_aug_kernel, nk=nk)
    return pl.pallas_call(
        kernel,
        grid=(BH, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, lane), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, lane), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, lane_v), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, lane_v), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, S, lane_v), dt),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, lane_v), jnp.float32),
        ],
        interpret=interpret,
    )(q_aug, k_aug, v_p)


def _windowed_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int, lane: int):
    """One program = one window; heads unrolled inside, every slice a
    128-aligned lane block.

    q_ref/k_ref: [1, S, H*lane] augmented-contraction operands — per head,
    q carries [q*scale, rel_h_term, rel_w_term, 0-pad] and k carries
    [k, one_hot(kh), one_hot(kw), 0-pad], so ONE matmul yields
    scores + decomposed rel-pos bias (image_encoder.py:292-361 math).
    v_ref: [1, S, H*lane] zero-padded values; o_ref: [1, S, H*lane].
    """
    for h in range(num_heads):
        lo = h * lane
        q = q_ref[0][:, lo : lo + lane]
        k = k_ref[0][:, lo : lo + lane]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [S, S] = q.k + rel_h + rel_w
        m = s.max(axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / p.sum(axis=1, keepdims=True)
        v = v_ref[0][:, lo : lo + lane]
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, :, lo : lo + lane] = o.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit, static_argnames=("num_heads", "grid_side", "interpret")
)
def flash_windowed_fused(
    qkv: jax.Array,  # [B, S, 3*D] from the qkv projection, S = grid_side**2
    rel_h: jax.Array,  # [B, S, H*G] f32: q . Rh[qh(s), kh] per head
    rel_w: jax.Array,  # [B, S, H*G] f32: q . Rw[qw(s), kw] per head
    num_heads: int,
    grid_side: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Whole-window attention with decomposed rel-pos folded into the score
    matmul, consuming the qkv projection in its natural [B, S, 3D] layout.

    Returns [B, S, H*lane] with lane = round_up(hd + 2G, 128): each head's
    output occupies cols [h*lane, h*lane + hd), the rest zeros — consume it
    with :func:`pad_windowed_proj` rows so no lane-repack copy is needed.

    Why this shape (trace-guided, v5e):
      * per-(window, head) grids cost ~0.7 ms/block of program overhead and
        need three [B, H, S, hd] head-major relayouts (~1.9 ms/block);
      * an in-kernel head loop over the raw 80-lane head slices pays a lane
        shuffle per unaligned slice and a 14-concat bias build per head
        (measured 0.82 ms/block);
      * here the bias rides the MXU: q is augmented with its two rel terms
        and k with the static kh/kw one-hots, every slice is 128-aligned,
        and the kernel body is two matmuls + a softmax per head.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, S, three_d = qkv.shape
    G = grid_side
    assert S == G * G, (S, G)
    D = three_d // 3
    hd = D // num_heads
    assert rel_h.shape == (B, S, num_heads * G), (rel_h.shape, (B, S, num_heads * G))
    lane = _round_up(hd + 2 * G, 128) if not interpret else hd + 2 * G
    dt = qkv.dtype
    scale = hd**-0.5

    q = qkv[..., :D].reshape(B, S, num_heads, hd)
    k = qkv[..., D : 2 * D].reshape(B, S, num_heads, hd)
    v = qkv[..., 2 * D :].reshape(B, S, num_heads, hd)
    rh = rel_h.reshape(B, S, num_heads, G).astype(dt)
    rw = rel_w.reshape(B, S, num_heads, G).astype(dt)
    # static selectors: key position s attends bias column kh(s)/kw(s)
    pos = np.arange(S)
    KH = jnp.asarray(np.eye(G, dtype=np.float32)[pos // G], dt)  # [S, G]
    KW = jnp.asarray(np.eye(G, dtype=np.float32)[pos % G], dt)
    sel = jnp.broadcast_to(
        jnp.concatenate([KH, KW], axis=-1)[None, :, None, :], (B, S, num_heads, 2 * G)
    )
    pad = lane - (hd + 2 * G)
    q_aug = jnp.concatenate([q * jnp.asarray(scale, dt), rh, rw], axis=-1)
    k_aug = jnp.concatenate([k, sel], axis=-1)
    if pad:
        q_aug = jnp.pad(q_aug, ((0, 0), (0, 0), (0, 0), (0, pad)))
        k_aug = jnp.pad(k_aug, ((0, 0), (0, 0), (0, 0), (0, pad)))
    v_aug = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, lane - hd)))
    HL = num_heads * lane
    q_aug = q_aug.reshape(B, S, HL)
    k_aug = k_aug.reshape(B, S, HL)
    v_aug = v_aug.reshape(B, S, HL)

    kernel = functools.partial(_windowed_kernel, num_heads=num_heads, lane=lane)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, HL), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, S, HL), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, S, HL), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, HL), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, HL), dt),
        interpret=interpret,
    )(q_aug, k_aug, v_aug)


def windowed_lane(head_dim: int, grid_side: int, interpret: bool) -> int:
    """The per-head output stride of :func:`flash_windowed_fused`."""
    raw = head_dim + 2 * grid_side
    return raw if interpret else _round_up(raw, 128)


def pad_windowed_proj(proj_w: jax.Array, num_heads: int, lane: int) -> jax.Array:
    """Expand proj rows [H*hd, D] -> [H*lane, D] (zero rows under the pad
    lanes) so the projection consumes the kernel's padded output directly
    instead of paying a lane-repack copy."""
    Da, D = proj_w.shape
    hd = Da // num_heads
    w = proj_w.reshape(num_heads, hd, D)
    w = jnp.pad(w, ((0, 0), (0, lane - hd), (0, 0)))
    return w.reshape(num_heads * lane, D)


def windowed_rel_terms(qkv: jax.Array, Rh: jax.Array, Rw: jax.Array, num_heads: int, grid_side: int):
    """The two [B, S, H*G] bias terms for :func:`flash_windowed_fused`,
    via per-row-block matmuls that never head-transpose q.

    rel_h[b, (qh, qw), h, kh] = sum_c q[b, qh, qw, h, c] * Rh[qh, kh, c]
    is a matmul batched over qh with M = B*G*H — healthy MXU shape, the
    q operand is a pure VIEW of qkv (no head transpose), and the output
    axes (b, qh, qw, h, kh) reshape straight into the kernel's
    [B, S, H*G] layout."""
    B, S, three_d = qkv.shape
    G = grid_side
    D = three_d // 3
    hd = D // num_heads
    q = qkv[..., :D].reshape(B, G, G, num_heads, hd)
    rel_h = jnp.einsum(
        "bqwhc,qkc->bqwhk", q, Rh, preferred_element_type=jnp.float32
    )
    rel_w = jnp.einsum(
        "bqwhc,wkc->bqwhk", q, Rw, preferred_element_type=jnp.float32
    )
    return rel_h.reshape(B, S, num_heads * G), rel_w.reshape(B, S, num_heads * G)


def reference_attention_rel_pos(q, k, v, rel_h, rel_w, grid_side):
    """Unfused jnp reference (and CPU fallback): identical math."""
    BH, S, hd = q.shape
    G = grid_side
    attn = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    bias = (
        rel_h[:, :, :, None] + rel_w[:, :, None, :]
    ).reshape(BH, S, S)  # [BH, S, (kh kw)]
    attn = attn + bias.astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", attn, v, preferred_element_type=jnp.float32).astype(q.dtype)
