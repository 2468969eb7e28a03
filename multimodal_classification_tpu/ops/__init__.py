"""TPU compute primitives.

Each op has a pure-jnp reference implementation (used for parity tests and as
the CPU fallback) and, where it is hot, a Pallas TPU kernel twin in
``ops.pallas_kernels``. These replace the compiled torchvision/detectron2
kernels the reference delegates to (SURVEY.md §2.8): RoIPool/RoIAlign, NMS,
anchor generation + box delta decode, attention chains, bilinear resampling.
"""

from multimodal_classification_tpu.ops.attention import (  # noqa: F401
    attention_core,
    bi_attention_core,
)
from multimodal_classification_tpu.ops.boxes import (  # noqa: F401
    box_area,
    box_iou,
    clip_boxes,
    decode_deltas,
    generate_anchors,
    generate_grid_boxes,
    grid_spatial,
    normalize_boxes,
)
from multimodal_classification_tpu.ops.nms import nms, batched_nms  # noqa: F401
from multimodal_classification_tpu.ops.pooling import (  # noqa: F401
    adaptive_avg_pool2d,
    adaptive_max_pool2d,
    bilinear_resize,
)
from multimodal_classification_tpu.ops.roi import roi_align, roi_pool  # noqa: F401
