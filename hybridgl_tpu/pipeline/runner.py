"""End-to-end zero-shot referring-segmentation pipeline.

Orchestrates the device-resident stages (all jitted, all static shapes):

  image stage     SAM proposals (models/sam/amg.py) -> device crop prep
                  (pipeline/preprocess.py) -> hybrid fusion features
                  (models/clip/fusion.py) -> GEM input prep
  sentence stage  text encoding (+ ensembles/negatives) -> CLIP scoring ->
                  box-relation + GEM guidance -> selection -> IoU update

The host only: decodes images, runs the expression parser/tokenizer, and
carries the reference's *sticky* k1/k2 clamp (reference:
Hybridgl_main.py:178-181 mutates k1/k2 for the rest of the run; reproduced
when CompatConfig.k_clamp_sticky).

This mirrors the reference driver's semantics (reference:
Hybridgl_main.py:23-231) with the host<->device chatter removed: the
reference crosses the device boundary per mask and per sentence; here each
stage is one dispatch.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import PipelineConfig
from ..eval.metrics import IoUAccum, mask_iou
from ..kernels.masks import box_xyxy_to_xywh
from ..kernels.resize import (
    place_valid_region_antialias,
    resize_bilinear,
    valid_mask,
)
from ..lang import ExpressionParser, ParsedExpression, get_parser
from ..utils.env import env_flag
from ..models.clip import tokenizer as tok
from ..models.clip.fusion import calculate_score, hybrid_forward
from ..models.clip.text import encode_text
from ..models.gem.gem import gem_image_features, gem_preprocess
from ..models.sam.amg import (
    Proposals,
    generate_proposals,
    generate_proposals_multicrop,
)
from .guidance import (
    dir_flag_id,
    gem_mask_scores,
    normalize_heatmap,
    rela_flag_id,
    select_candidates,
)
from .postprocess import (
    postprocess_small_regions as postprocess_small_regions_host,
)
from .preprocess import build_crops


# rows of the packed-mask buffer prefetched at dispatch (see proposal_stage)
_PACKED_HEAD = 8


@functools.lru_cache(maxsize=None)
def _packed_slice_jit(bucket: int):
    """Cached per-bucket jit: device-side row slice of the packed masks
    (one tiny program per power-of-2 bucket; sliced rows then move
    device->host instead of the whole [P, C, C/8] buffer)."""
    return jax.jit(lambda p: p[:bucket])


class ImageSample(NamedTuple):
    """Host-prepared per-image inputs (see data/datasets.py)."""

    image_1024: np.ndarray  # [1024, 1024, 3] uint8, long-side resized + padded
    rh: int  # valid rows in the 1024 frame
    rw: int
    image_canonical: np.ndarray  # [C, C, 3] uint8, original res at origin
    h: int  # original height (<= C)
    w: int
    gt_mask: Optional[np.ndarray]  # [C, C] bool (None for demo)
    sentences: Sequence[str]


class SentenceResult(NamedTuple):
    sentence: str
    pure_index: int
    final_index: int
    pure_iou: float
    final_iou: float


@dataclass
class PipelineState:
    """Host-side mutable run state (sticky clamps + metric accumulators)."""

    k1: int
    k2: int
    pure: IoUAccum
    final: IoUAccum


class HybridGLPipeline:
    def __init__(
        self,
        cfg: PipelineConfig,
        sam_params,
        clip_params,
        parser: Optional[ExpressionParser] = None,
        tokenizer: Optional[tok.ClipTokenizer] = None,
    ):
        self.cfg = cfg
        if "blocks" in sam_params.get("encoder", {}):
            # pre-stack the encoder blocks for the scan path (see
            # models/sam/image_encoder.py:stack_encoder_runs) — one-time
            # device copy at construction, removes per-call restacking
            from ..models.sam.image_encoder import stack_encoder_runs

            # One jitted program (eager stacking would issue ~64 tiny ops,
            # each a ~0.5 s compile on the tunneled backend). NOT donated:
            # donation would delete the caller's param pytree, and passing
            # params to a constructor must not consume them (our own eval
            # tests legitimately reuse params across pipelines). The
            # list-format copy (~1.2 GB ViT-H bf16) stays alive only while
            # the caller holds it — `del` it for tight-memory serving.
            sam_params = jax.jit(lambda p: stack_encoder_runs(p, cfg.sam))(
                sam_params
            )
        vis = clip_params.get("visual", {})
        if "blocks" in vis or "blocks" in clip_params.get("text", {}):
            clip_params = jax.jit(_stack_clip_params)(clip_params)
        self.sam_params = sam_params
        self.clip_params = clip_params
        self.parser = parser or get_parser(
            rela_right_bug=cfg.compat.rela_right_bug
        )
        self.tokenizer = tokenizer or tok.default_tokenizer()
        self.timer = None  # optional utils.profiling.StageTimer
        self.survival_hook = None  # optional Proposals -> Proposals override
        self._warned_overflow = False
        self._sentence_rows = {}  # sentence -> parsed/tokenized row cache
        self._build_stages()

    # ------------------------------------------------------------------ jit
    def _build_stages(self):
        cfg = self.cfg
        sam_cfg, clip_cfg = cfg.sam, cfg.clip
        C = cfg.canonical_size

        # Small-region cleanup placement. HYBRIDGL_CLEANUP=device folds the
        # jittable connected-components pass (kernels/connected.py, exact
        # parity per tests/test_connected.py) into the proposal dispatch —
        # required inside shard_map (parallel/full_eval.py) but measured
        # 7.8 s/img on v5e for dense random masks (the min-label
        # propagation's flat gathers and the size histogram's scatter-add
        # serialise on TPU), so the sequential driver defaults to the host
        # cv2 pass (~540 ms/img worst-case, overlapped by the software
        # pipeline; see bench BENCH_PROFILE attribution).
        self._device_cleanup = (
            cfg.amg.min_mask_region_area > 0
            and os.environ.get("HYBRIDGL_CLEANUP", "host") == "device"
        )
        device_cleanup = self._device_cleanup

        def proposal_stage(sam_params, image_1024, rh, rw, image_c, h, w):
            if cfg.amg.crop_n_layers >= 1:
                props = generate_proposals_multicrop(
                    sam_params, image_1024, rh, rw, image_c, h, w, sam_cfg, cfg.amg, C
                )
            else:
                props = generate_proposals(
                    sam_params, image_1024, rh, rw, h, w, sam_cfg, cfg.amg, C
                )
            if device_cleanup:
                from ..kernels.connected import cleanup_proposals_jit

                props = cleanup_proposals_jit(
                    props,
                    valid_mask((C, C), (h, w)),
                    cfg.amg.min_mask_region_area,
                    max(cfg.amg.box_nms_thresh, cfg.amg.crop_nms_thresh),
                )
            # Pre-pack the masks for the host cleanup INSIDE this dispatch:
            # a packbits issued later (from _cleanup_host) would enqueue
            # BEHIND the next image's already-dispatched proposal stage on
            # the in-order TPU stream, stalling the host ~400 ms per image
            # before its cleanup could even start (measured; this was the
            # round-1 overlap killer).
            packed = aux = None
            if cfg.amg.min_mask_region_area > 0 and not device_cleanup:
                packed = jnp.packbits(props.masks, axis=-1)
                # the small per-proposal fields the host cleanup needs, as
                # ONE f32 buffer (separate np.asarray reads would each pay
                # the ~36 ms tunnel round-trip)
                aux = jnp.concatenate(
                    [
                        props.boxes_xyxy.astype(jnp.float32).ravel(),
                        props.iou_preds.astype(jnp.float32),
                        props.stability.astype(jnp.float32),
                        props.points.astype(jnp.float32).ravel(),
                        props.areas.astype(jnp.float32),
                    ]
                )
            # One tiny [2+P] download replaces three separate host reads
            # (num, overflow, valid): every synchronous device read costs a
            # full tunnel round-trip (~36 ms measured), so scalars are
            # batched into a single buffer fetched once per image.
            meta = jnp.concatenate(
                [
                    jnp.reshape(props.num, (1,)).astype(jnp.int32),
                    jnp.reshape(props.overflow, (1,)).astype(jnp.int32),
                    props.valid.astype(jnp.int32),
                ]
            )
            # the head slice prefetches at dispatch: NMS survival is often
            # << P (degenerate inputs keep ~1 box), so most images' cleanup
            # needs only these rows — the full [P, C, C/8] buffer stays on
            # device and a bucket slice is fetched on demand (see
            # _cleanup_host), keeping ~3 MB/img off the slow tunnel
            packed_head = packed[:_PACKED_HEAD] if packed is not None else None
            return props, packed, packed_head, aux, meta

        def feature_stage(clip_params, props, image_c, h, w):
            glob, local = build_crops(
                image_c, props.masks, (h, w), cfg.crop_size, cfg.blur_ksize
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
                masks_hw=(h, w),
            )
            # squash-resize the valid region to the GEM input size (uint8
            # rounding matches the reference's PIL intermediate), then
            # normalize with the OpenAI CLIP statistics
            gem_u8 = jnp.round(
                resize_bilinear(
                    image_c, (cfg.gem.img_size, cfg.gem.img_size), src_hw=(h, w)
                )
            ).astype(jnp.uint8)
            gem_img = gem_preprocess(gem_u8, cfg.gem.img_size)
            # GEM patch features are text-independent: compute once per
            # image (the reference recomputes the full GEM forward per
            # sentence, Hybridgl_main.py:200); the per-sentence cost drops
            # to one [G^2, E] x [E] product.
            gem_pf, _, gem_grid = gem_image_features(
                clip_params["visual"], gem_img[None], clip_cfg, cfg.gem
            )
            gem_pf = gem_pf[0] / jnp.maximum(
                jnp.linalg.norm(gem_pf[0], axis=-1, keepdims=True), 1e-6
            )
            return feats, gem_pf

        gem_grid_static = cfg.gem.img_size // cfg.clip.patch_size

        def sentence_stage(
            clip_params,
            props: Proposals,
            feats,
            gem_pf,
            h,
            w,
            toks_all,  # [2+K, 77]: sentence, noun phrase, other nouns
            n_others,  # int scalar
            dir_flag,
            rela_flag,
            black,
            has_other,
            k1,
            k2,
            gt_mask,
        ):
            text_p = clip_params["text"]
            tf = encode_text(text_p, toks_all, clip_cfg)
            sent_f, np_f, other_f = tf[0], tf[1], tf[2:]
            r = cfg.guidance.r
            text_ensemble = r * sent_f + (1 - r) * np_f

            ls = clip_params["logit_scale"]
            score = calculate_score(feats, text_ensemble[None], ls)[:, 0]
            k_mask = (jnp.arange(other_f.shape[0]) < n_others)[:, None]
            neg_sum = jnp.where(k_mask, other_f, 0.0).sum(0)
            neg_mean = jnp.where(n_others > 0, neg_sum / jnp.maximum(n_others, 1), 0.0)
            # guard the zero vector (reference leaves NaNs in the unused branch)
            neg_norm = jnp.maximum(jnp.linalg.norm(neg_mean), 1e-6)
            score_neg = (
                jnp.exp(ls)
                * (feats / jnp.linalg.norm(feats, axis=-1, keepdims=True))
                @ (neg_mean / neg_norm)
            )

            # GEM heatmap for the noun phrase -> back to the original (h, w)
            # region of the canonical frame. The reference resizes the
            # 448-frame map to the image size with antialias=True
            # (Hybridgl_main.py:201): a triangle filter that differs from
            # plain bilinear whenever an image side is below 448.
            npf_n = np_f / jnp.maximum(jnp.linalg.norm(np_f), 1e-6)
            rel = (gem_pf @ npf_n).reshape(gem_grid_static, gem_grid_static)
            heat448 = resize_bilinear(rel, (cfg.gem.img_size, cfg.gem.img_size))
            heat = place_valid_region_antialias(heat448, (C, C), (h, w))
            vm = valid_mask((C, C), (h, w))
            heat = normalize_heatmap(heat, vm, dir_flag)

            gem_scores = gem_mask_scores(heat, props.masks, vm, black)

            sel = select_candidates(
                score,
                score_neg,
                box_xyxy_to_xywh(props.boxes_xyxy),
                gem_scores,
                props.valid,
                rela_flag,
                has_other,
                k1,
                k2,
                alpha=cfg.guidance.alpha,
            )
            pure_iu = mask_iou(props.masks[sel.pure_index], gt_mask)
            final_iu = mask_iou(props.masks[sel.final_index], gt_mask)
            return sel, score, pure_iu, final_iu

        def sentence_stage_accum(
            clip_params, props, feats, gem_pf, h, w,
            toks_all, n_others,
            dir_flag, rela_flag, black, has_other, k1, k2, gt_mask,
            pure_acc, final_acc, acc_enable,
        ):
            """Sentence stage + in-dispatch metric accumulation: the
            accumulators ride along as device-resident args, so updating
            them costs zero extra dispatches (the reference reads IoU back
            per sentence; separate host-side accumulate ops each paid ~4 ms
            of tunnel dispatch latency)."""
            sel, score, pure_iu, final_iu = sentence_stage(
                clip_params, props, feats, gem_pf, h, w,
                toks_all, n_others,
                dir_flag, rela_flag, black, has_other, k1, k2, gt_mask,
            )
            e = jnp.asarray(acc_enable, jnp.float32)

            def upd(acc, iu):
                i, u, iou = iu
                return IoUAccum(
                    acc.cum_i + e * i,
                    acc.cum_u + e * u,
                    acc.sum_iou + e * iou,
                    acc.count + e,
                )

            return sel, score, pure_iu, final_iu, upd(pure_acc, pure_iu), upd(final_acc, final_iu)

        self._proposal_stage = jax.jit(proposal_stage)
        self._feature_stage = jax.jit(feature_stage)
        self._sentence_stage = jax.jit(sentence_stage_accum)
        # optional: all sentences of an image in ONE dispatch (shared inputs
        # broadcast, per-sentence inputs vmapped). Halves the serialized
        # stage cost but measured slower end-to-end on v5e — see
        # _score_image for the measurements; opt-in HYBRIDGL_BATCH_SENTENCES.
        self._sentence_stage_batched = jax.jit(
            jax.vmap(
                sentence_stage,
                in_axes=(None, None, None, None, None, None, 0, 0, 0, 0, 0, 0, None, None, None),
            )
        )

    # ----------------------------------------------------------------- host
    def init_state(self) -> PipelineState:
        return PipelineState(
            k1=self.cfg.guidance.k1,
            k2=self.cfg.guidance.k2,
            pure=IoUAccum.zeros(),
            final=IoUAccum.zeros(),
        )

    def _tokenize_parsed(self, parsed: ParsedExpression):
        K = self.cfg.guidance.max_other_nouns
        L = self.cfg.clip.context_length
        tk = dict(tokenizer=self.tokenizer, context_length=L, truncate=True)
        toks_all = np.zeros((2 + K, L), np.int32)  # one upload per sentence
        toks_all[0] = tok.tokenize(parsed.sentence, **tk)[0]
        toks_all[1] = tok.tokenize(parsed.noun_phrase, **tk)[0]
        others = parsed.other_noun_phrases[:K]
        for i, noun in enumerate(others):
            toks_all[2 + i] = tok.tokenize("a photo of " + noun, **tk)[0]
        return toks_all, len(others)

    def _black(self, rela_flag: str) -> float:
        g = self.cfg.guidance
        if rela_flag == "big":
            return g.black_big
        if rela_flag == "small":
            return g.black_small
        return g.black_other

    def propose(self, sample: ImageSample) -> Proposals:
        """SAM proposal generation + (optional) host small-region cleanup
        (reference: automatic_mask_generator.py:166-171 applies it whenever
        min_mask_region_area > 0 — true for both driver configs)."""
        props, _ = self._propose_with_image(sample)
        return props

    def _propose_with_image(self, sample: ImageSample):
        """propose() that also returns the uploaded canonical-image device
        buffer so single-image callers (run_image) reuse it instead of
        re-uploading ~1.2 MB per image in _score_image."""
        with self._span("proposals"):
            props, packed, packed_head, aux, meta, image_c = (
                self._dispatch_proposals(sample)
            )
        props = self._finish_props(
            props, packed, packed_head, aux, meta, (sample.h, sample.w)
        )
        return props, image_c

    def _cleanup_host(self, props: Proposals, hw, packed, packed_head, aux) -> Proposals:
        """Host small-region cleanup with bit-packed, LIVE-ROW-BUCKETED
        mask transfers: [P, C, C] bool moves as packed uint8 (8x) and only
        a power-of-2 bucket of the live rows crosses the tunnel — the head
        rows were already prefetched at dispatch, so the common degenerate-
        survival case pays no extra transfer at all, and even a full bucket
        moves ~3 MB/img less device->host pressure on average.
        ``aux``/``packed_head`` were async-copied at dispatch time (see
        proposal_stage / _dispatch_proposals)."""
        C = self.cfg.canonical_size
        P = int(props.masks.shape[0])
        # Unpack ONLY the live rows (NMS survival is often << P), and VIEW
        # the uint8 0/1 output as bool instead of astype — each avoided
        # full-frame pass is ~26 MB of host memory traffic, which dominates
        # this stage whenever the shared host is CPU-starved.
        valid_np = np.asarray(props.valid)
        n_live = int(valid_np.nonzero()[0][-1]) + 1 if valid_np.any() else 0
        if n_live <= _PACKED_HEAD:
            packed_np = np.asarray(packed_head)  # prefetched at dispatch
        else:
            bucket = _PACKED_HEAD
            while bucket < n_live:
                bucket *= 2
            bucket = min(bucket, P)
            packed_np = np.asarray(_packed_slice_jit(bucket)(packed))
        masks_np = np.zeros((P, C, C), np.uint8)
        if n_live > 0:
            masks_np[:n_live] = np.unpackbits(packed_np[:n_live], axis=-1, count=C)
        masks_np = masks_np.view(np.bool_)
        a = np.asarray(aux)
        host_props = Proposals(
            masks=masks_np,
            boxes_xyxy=a[: P * 4].reshape(P, 4),
            iou_preds=a[P * 4 : P * 5],
            stability=a[P * 5 : P * 6],
            points=a[P * 6 : P * 8].reshape(P, 2),
            areas=a[P * 8 : P * 9],
            valid=valid_np,  # numpy already (from meta)
            num=np.asarray(props.num),
            overflow=props.overflow,
        )
        out, changed = postprocess_small_regions_host(
            host_props,
            self.cfg.amg.min_mask_region_area,
            max(self.cfg.amg.box_nms_thresh, self.cfg.amg.crop_nms_thresh),
            return_changed=True,
            hw=hw,
            inplace_masks=True,  # masks_np is this call's own buffer
        )
        if not changed:
            # nothing modified or suppressed (the common case with real
            # weights): keep the device-resident originals, skip re-upload
            return props
        repacked = np.zeros((P, C, C // 8), np.uint8)
        if n_live > 0:  # rows past the last live index stayed all-False
            repacked[:n_live] = np.packbits(out.masks[:n_live], axis=-1)
        dev_masks = jnp.unpackbits(
            jnp.asarray(repacked), axis=-1, count=C
        ).astype(bool)
        # small fields stay numpy: jit re-uploads them per call (cheap on
        # the fast host->device direction) and the host never needs another
        # synchronous read for num/valid
        return out._replace(masks=dev_masks, overflow=props.overflow)

    def _span(self, name: str):
        import contextlib

        if self.timer is None:
            return contextlib.nullcontext()
        return self.timer.span(name)

    def _dispatch_proposals(self, sample: ImageSample):
        """Async-dispatch the proposal stage (device work starts now).

        The packed-mask and meta outputs start copying to the host as soon
        as the device produces them (``copy_to_host_async``): the tunnel's
        device->host path is slow (~13 MB/s measured vs ~390 MB/s up), so
        the 3.3 MB packed transfer must overlap the next stages' compute
        rather than stall the host when cleanup finally asks for it."""
        # the canonical-frame upload rides in the returned tuple so the
        # feature stage reuses the same device buffer instead of
        # re-uploading ~1.2 MB over the tunnel (carried explicitly — an
        # id(sample)-keyed cache could alias a freed sample's id)
        image_c = jnp.asarray(sample.image_canonical)
        props, packed, packed_head, aux, meta = self._proposal_stage(
            self.sam_params,
            jnp.asarray(sample.image_1024),
            sample.rh,
            sample.rw,
            image_c,
            sample.h,
            sample.w,
        )
        # head/aux prefetch is unconditional even though zero-survivor
        # images never consume them: gating on num would need a synchronous
        # meta read here, stalling every image ~36 ms (tunnel RTT) to save
        # a rare wasted overlapped transfer. Only the HEAD rows of the
        # packed masks prefetch — the full buffer moves on demand.
        for buf in (packed_head, aux, meta):
            if buf is not None:
                try:
                    buf.copy_to_host_async()
                except Exception:
                    pass  # platforms without async host copies
        return props, packed, packed_head, aux, meta, image_c

    def _finish_props(
        self, props: Proposals, packed, packed_head, aux, meta, hw
    ) -> Proposals:
        # One host read covers num + overflow + valid (see proposal_stage);
        # the values replace the device scalars in the bundle so later
        # stages never pay another synchronous tunnel round-trip for them.
        meta_np = np.asarray(meta)
        overflow = int(meta_np[1])
        props = props._replace(
            num=meta_np[0].astype(np.int32),
            valid=meta_np[2:].astype(bool),
        )
        # Surface static-bucket truncation: the reference keeps every NMS
        # survivor (automatic_mask_generator.py:197-264); if our
        # max_proposals / max_candidates_per_crop buckets dropped any,
        # coverage silently shrank — warn once with the configured knobs.
        if overflow > 0 and not self._warned_overflow:
            import warnings

            self._warned_overflow = True
            warnings.warn(
                f"proposal bucket overflow: {overflow} NMS survivor(s) dropped "
                f"(max_proposals={self.cfg.amg.max_proposals}, "
                f"max_candidates_per_crop={self.cfg.amg.max_candidates_per_crop}); "
                "raise the buckets to keep reference-parity coverage",
                stacklevel=2,
            )
        if self.cfg.amg.min_mask_region_area > 0 and not self._device_cleanup:
            with self._span("small_region_cleanup"):
                if int(props.num) > 0:
                    props = self._cleanup_host(props, hw, packed, packed_head, aux)
        if self.survival_hook is not None:
            # benchmarking/testing knob: override proposal survival after
            # the stage (bench.py uses it to drive representative bucket
            # occupancy — random weights yield degenerate NMS survival)
            props = self.survival_hook(props)
        return props

    def run_dataset(self, samples, state: PipelineState, yield_props: bool = False):
        """Software-pipelined iteration: image i+1's proposal stage is
        dispatched (device, async) before image i's host cleanup runs, so
        the TPU never idles on connected-components/cv2 host work. Yields
        (sample, results) pairs — or (sample, results, proposals) with
        ``yield_props`` (for visualisation) — and mutates ``state``.
        """
        pending = None  # (sample, proposals, packed, packed_head, aux, meta, image_c)

        def emit(smp, raw_props, packed, packed_head, aux, meta, image_c):
            props = self._finish_props(
                raw_props, packed, packed_head, aux, meta, (smp.h, smp.w)
            )
            results = self._score_image(smp, props, state, image_c=image_c)
            return (smp, results, props) if yield_props else (smp, results)

        for sample in samples:
            with self._span("proposals_dispatch"):
                pending_next = (sample, *self._dispatch_proposals(sample))
            if pending is not None:
                yield emit(*pending)
            pending = pending_next
        if pending is not None:
            yield emit(*pending)

    def run_image(
        self, sample: ImageSample, state: PipelineState
    ) -> List[SentenceResult]:
        """Process one image; mutates ``state`` accumulators (host loop)."""
        props, image_c = self._propose_with_image(sample)
        return self._score_image(sample, props, state, image_c=image_c)

    # (proposal dispatches return (props, packed-mask) pairs; see
    # proposal_stage for why packing happens inside the jit)

    def _bucket_props(self, props: Proposals, num_props: int) -> Proposals:
        """Slice the proposal bundle to the smallest power-of-two bucket
        (min 8) covering every live proposal. Raw AMG output orders valid
        proposals first, but small-region cleanup invalidates suppressed
        duplicates *in place* (pipeline/postprocess.py), so validity is not
        necessarily a prefix — the bucket therefore covers the highest live
        index, not just valid.sum(). Indices into the bucketed arrays equal
        indices into the full bundle. Each bucket size is its own cached jit
        specialisation; the fusion stage's cost scales with the bucket
        instead of the worst-case P."""
        P = int(props.masks.shape[0])
        if env_flag("HYBRIDGL_NO_BUCKETING"):
            return props  # single jit specialisation (benchmarks/CI)
        from ..utils.buckets import next_pow2

        valid = np.asarray(props.valid)
        extent = int(valid.nonzero()[0].max()) + 1 if valid.any() else num_props
        bucket = min(next_pow2(extent, base=8), P)
        return self._slice_props(props, bucket)

    @staticmethod
    def _slice_props(props: Proposals, bucket: int) -> Proposals:
        """Slice the bundle to a known bucket size (async device slices, no
        host reads) — bench.py's device probe replays pre-computed buckets
        through this so it hits the same jit specialisations as the e2e path."""
        if bucket >= int(props.masks.shape[0]):
            return props
        sliced = {
            f: getattr(props, f)[:bucket]
            for f in ("masks", "boxes_xyxy", "iou_preds", "stability", "points", "areas", "valid")
        }
        return props._replace(**sliced)

    def _score_image(
        self,
        sample: ImageSample,
        props: Proposals,
        state: PipelineState,
        image_c=None,
    ) -> List[SentenceResult]:
        num_props = int(props.num)
        if num_props == 0:
            # no proposals survived: count a miss per sentence (the reference
            # would crash on torch.stack([]); we record IoU 0 to keep long
            # runs alive)
            gt_area = float(np.sum(sample.gt_mask)) if sample.gt_mask is not None else 0.0
            out = []
            for s in sample.sentences:
                miss = (0.0, gt_area, 0.0)
                state.pure = _accumulate(state.pure, miss)
                state.final = _accumulate(state.final, miss)
                out.append(SentenceResult(s, -1, -1, 0.0, 0.0))
            return out

        props = self._bucket_props(props, num_props)
        if image_c is None:
            image_c = jnp.asarray(sample.image_canonical)
        with self._span("crops+fusion"):
            feats, gem_pf = self._feature_stage(
                self.clip_params,
                props,
                image_c,
                sample.h,
                sample.w,
            )

        # sticky clamp (reference: Hybridgl_main.py:178-181)
        if self.cfg.compat.k_clamp_sticky:
            if state.k1 > num_props:
                state.k1 = num_props
            if state.k2 > num_props:
                state.k2 = num_props
            k1, k2 = state.k1, state.k2
        else:
            k1 = min(self.cfg.guidance.k1, num_props)
            k2 = min(self.cfg.guidance.k2, num_props)

        gt = (
            jnp.asarray(sample.gt_mask)
            if sample.gt_mask is not None
            else jnp.zeros((self.cfg.canonical_size,) * 2, bool)
        )

        ns = len(sample.sentences)
        with self._span("parse+tokenize"):
            rows = []
            for sentence in sample.sentences:
                # parse + BPE are deterministic per sentence; referring
                # expressions repeat across refs (and the single-core host
                # pays ~45 ms/img here), so memoise per pipeline
                row = self._sentence_rows.get(sentence)
                if row is None:
                    parsed = self.parser.parse(sentence)
                    toks_all, n_others = self._tokenize_parsed(parsed)
                    row = (
                        toks_all,
                        n_others,
                        dir_flag_id(parsed.dir_flag),
                        rela_flag_id(parsed.rela_flag),
                        self._black(parsed.rela_flag),
                        parsed.has_other_nouns,
                    )
                    if len(self._sentence_rows) < 65536:  # bound memory
                        self._sentence_rows[sentence] = row
                rows.append(row)

        # Default: one async dispatch per sentence. The vmapped single-
        # dispatch variant (HYBRIDGL_BATCH_SENTENCES=1) halves the
        # SERIALIZED stage cost (146 -> 67 ms/img at 2 sentences) but
        # measured slower end-to-end on v5e (0.86 vs 1.18 back-to-back;
        # batched never matched per-sentence peaks across the day) — the
        # small per-sentence launches overlap the next image's host work
        # better than one wide launch. Kept opt-in pending a quieter host.
        if env_flag("HYBRIDGL_BATCH_SENTENCES"):
            return self._sentences_batched(sample, props, feats, gem_pf, rows, k1, k2, gt, state)

        results = []
        has_gt = sample.gt_mask is not None
        for sentence, row in zip(sample.sentences, rows):
            toks_all, n_others, dflag, rflag, black, has_other = row
            with self._span("sentence_stage"):
                # metric accumulators ride along inside the dispatch (zero
                # extra device ops; see sentence_stage_accum) — reading
                # state later forces the only sync
                sel, score, pure_iu, final_iu, state.pure, state.final = (
                    self._sentence_stage(
                        self.clip_params,
                        props,
                        feats,
                        gem_pf,
                        sample.h,
                        sample.w,
                        jnp.asarray(toks_all),
                        n_others,
                        dflag,
                        rflag,
                        black,
                        has_other,
                        k1,
                        k2,
                        gt,
                        state.pure,
                        state.final,
                        has_gt,
                    )
                )
            results.append(
                SentenceResult(
                    sentence,
                    sel.pure_index,
                    sel.final_index,
                    pure_iu[2],
                    final_iu[2],
                )
            )
        return results

    def _sentences_batched(self, sample, props, feats, gem_pf, rows, k1, k2, gt, state):
        """All sentences of an image in ONE vmapped dispatch (power-of-two
        sentence buckets; padded rows repeat row 0, outputs discarded)."""
        from ..utils.buckets import next_pow2

        ns = len(rows)
        bucket = next_pow2(ns)
        rows = rows + [rows[0]] * (bucket - ns)
        cols = list(zip(*rows))
        batched = [np.stack([np.asarray(v) for v in col]) for col in cols]

        with self._span("sentence_stage"):
            sel, score, pure_iu, final_iu = self._sentence_stage_batched(
                self.clip_params,
                props,
                feats,
                gem_pf,
                sample.h,
                sample.w,
                *(jnp.asarray(b) for b in batched),
                k1,
                k2,
                gt,
            )

        results = []
        for i, sentence in enumerate(sample.sentences):
            piu = (pure_iu[0][i], pure_iu[1][i], pure_iu[2][i])
            fiu = (final_iu[0][i], final_iu[1][i], final_iu[2][i])
            if sample.gt_mask is not None:
                state.pure = _accumulate(state.pure, piu)
                state.final = _accumulate(state.final, fiu)
            results.append(
                SentenceResult(
                    sentence,
                    sel.pure_index[i],
                    sel.final_index[i],
                    piu[2],
                    fiu[2],
                )
            )
        return results


def materialize_results(results: List[SentenceResult]) -> List[SentenceResult]:
    """Force the (possibly device-resident) scalars of SentenceResults.

    Call at reporting boundaries, not per sentence — reading a device
    scalar synchronizes the stream.
    """
    return [
        SentenceResult(
            r.sentence,
            int(r.pure_index),
            int(r.final_index),
            float(r.pure_iou),
            float(r.final_iou),
        )
        for r in results
    ]


def _stack_clip_params(clip_params):
    """Stack the CLIP visual/text transformer blocks for the scan paths
    (models/clip/layers.py:stack_block_params); the per-block lists are
    dropped from the runtime pytree so each dispatch marshals ~24 arg
    buffers instead of ~400. ModifiedResNet visuals pass through."""
    from ..models.clip.layers import stack_block_params

    cp = dict(clip_params)
    vis = dict(cp["visual"])
    if "blocks" in vis and "class_embedding" in vis:
        vis["blocks_stacked"] = stack_block_params(vis.pop("blocks"))
    txt = dict(cp["text"])
    if "blocks" in txt:
        txt["blocks_stacked"] = stack_block_params(txt.pop("blocks"))
    cp["visual"], cp["text"] = vis, txt
    return cp


def _accumulate(acc: IoUAccum, iu) -> IoUAccum:
    i, u, iou = iu
    return IoUAccum(
        acc.cum_i + i, acc.cum_u + u, acc.sum_iou + iou, acc.count + 1.0
    )
