"""Visual feature-extractor registry (the reference's capability matrix,
SURVEY.md §2.2): every backend emits (features [N, 2048], spatial [N, 5]).

Registered names match the reference's FEATURE_EXTRACTOR_REGISTRY
(feature_extractors/__init__.py:75-128): resnet, resnet152_roi, resnet_vg,
dinov2, dinov2_multilayer, clip, fasterrcnn, fasterrcnn_resnet152,
fasterrcnn_vg, fasterrcnn_vg_rpn, grid_x152, grid_x152_standard.
"""

from multimodal_classification_tpu.extractors import resnet_grid as resnet_grid  # noqa: F401
from multimodal_classification_tpu.extractors import resnet_roi as resnet_roi  # noqa: F401
from multimodal_classification_tpu.extractors import vit as vit  # noqa: F401
from multimodal_classification_tpu.extractors import frcnn as frcnn  # noqa: F401
from multimodal_classification_tpu.extractors.base import (  # noqa: F401
    BaseExtractor,
    load_image,
    normalize_images,
    resize_images,
)
from multimodal_classification_tpu.extractors.store import ExtractorFeatureStore  # noqa: F401
