"""hybridgl_tpu — TPU-native zero-shot referring image segmentation framework.

A ground-up JAX / XLA / Pallas rebuild of the capabilities of
fhgyuanshen/HybridGL (CVPR 2025): SAM mask proposals + hybrid global/local
CLIP scoring + augmented spatial guidance (box relations + GEM dense
relevance), designed TPU-first: jitted fixed-shape pipelines, Pallas
flash-attention kernels, device-resident crop preprocessing, and
data-parallel scale-out over a `jax.sharding.Mesh`.

Layer map (bottom-up):
  kernels/   Pallas + XLA compute primitives (attention, resize, blur, NMS)
  models/    clip (ViT + text + fusion modes), sam (encoder/decoder/AMG), gem
  pipeline/  device-resident proposal->score->guidance->selection stages
  lang/      host-side expression parsing (spaCy adapter + heuristic fallback)
  data/      REFER / PhraseCut loaders, RLE codec, host->HBM prefetch
  eval/      IoU accumulators (psum-ready), result logging, parity harness
  cli/       flag-compatible entry points (hybridgl-main / hybridgl-demo)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level convenience exports (keeps `import hybridgl_tpu` light)."""
    if name == "PipelineConfig":
        from .core.config import PipelineConfig

        return PipelineConfig
    if name == "HybridGLPipeline":
        from .pipeline.runner import HybridGLPipeline

        return HybridGLPipeline
    if name == "SamPredictor":
        from .models.sam.predictor import SamPredictor

        return SamPredictor
    if name == "tokenize":
        from .models.clip.tokenizer import tokenize

        return tokenize
    raise AttributeError(name)
