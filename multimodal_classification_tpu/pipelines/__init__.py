"""Named-pipeline registry — the user surface of the reference preserved
(reference: pipeline_registry.py:28-128, ~30 names):

``vilbert_<variant>_train`` = data_processing + model training;
``model_training_<variant>`` = training only (pre-processed splits);
``vilbert_validate`` / ``vilbert_inference[_local]``; ``data_processing``.
"""

from __future__ import annotations

from functools import partial

from multimodal_classification_tpu.pipelines import base as base  # noqa: F401
from multimodal_classification_tpu.pipelines.base import (  # noqa: F401
    run_data_processing,
    run_inference_pipeline,
    run_training_pipeline,
    run_validation_pipeline,
)
from multimodal_classification_tpu.registry import PIPELINE_REGISTRY, register_pipeline

_TRAIN_VARIANTS = [
    "",  # vilbert_train (default resnet grid extractor)
    "frcnn",
    "frcnn_resnet152",
    "dinov2",
    "dinov2_multilayer",
    "vg",
    "vg_rpn",
    "resnet_vg",
    "resnet152_grid",
    "resnet152_roi",
    "precomputed",
    "lmdb",
    "x152",
    # ablation variants (the reference's regression grid, BASELINE.md:
    # freeze-6 deltas, focal-loss deltas, LMDB batch 16 vs 32 = +1.47 pts)
    "lmdb_b32",
    "lmdb_freeze6",
    "lmdb_focal",
    "resnet152_roi_freeze6",
    "resnet152_roi_focal",
    "dinov2_freeze6",
]


def _register_all():
    register_pipeline("data_processing")(run_data_processing)
    for variant in _TRAIN_VARIANTS:
        suffix = f"_{variant}" if variant else ""
        full = partial(run_training_pipeline, variant)
        PIPELINE_REGISTRY[f"vilbert{suffix}_train"] = full
        PIPELINE_REGISTRY[f"model_training{suffix}" if variant else "model_training"] = full
    PIPELINE_REGISTRY["vilbert"] = PIPELINE_REGISTRY["vilbert_train"]
    PIPELINE_REGISTRY["__default__"] = PIPELINE_REGISTRY["vilbert_train"]
    PIPELINE_REGISTRY["vilbert_validate"] = partial(run_validation_pipeline, "")
    PIPELINE_REGISTRY["model_validation"] = PIPELINE_REGISTRY["vilbert_validate"]
    PIPELINE_REGISTRY["vilbert_inference"] = partial(
        run_inference_pipeline, "", use_local_checkpoint=False
    )
    PIPELINE_REGISTRY["vilbert_inference_local"] = partial(
        run_inference_pipeline, "", use_local_checkpoint=True
    )
    PIPELINE_REGISTRY["model_inference"] = PIPELINE_REGISTRY["vilbert_inference"]
    PIPELINE_REGISTRY["model_inference_local"] = PIPELINE_REGISTRY["vilbert_inference_local"]


_register_all()
