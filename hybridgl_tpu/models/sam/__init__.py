"""SAM model family (TPU-native functional modules + convenience API)."""

from .amg import (  # noqa: F401
    Proposals,
    build_point_grid,
    generate_proposals,
    generate_proposals_multicrop,
)
from .decoder import predict_masks, two_way_transformer  # noqa: F401
from .image_encoder import encode_image  # noqa: F401
from .predictor import SamPredictor  # noqa: F401
from .prompt_encoder import dense_pe, embed_boxes, embed_points  # noqa: F401
from .sam import encode, get_preprocess_shape, predict_points, preprocess  # noqa: F401
