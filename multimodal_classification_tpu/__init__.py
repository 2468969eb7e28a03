"""multimodal_classification_tpu — a TPU-native multimodal classification framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of the reference
``ahshabayek/MultiModal_classification`` stack (Kedro + PyTorch ViLBERT for the
Hateful Memes challenge; see /root/reference and SURVEY.md):

- ``models``     — two-stream ViLBERT (Facebook-exact asymmetric arch and the
                   symmetric 768-d core variant) as pure-functional Flax modules.
- ``ops``        — TPU compute primitives: fused co-attention (Pallas), ROI
                   align/pool, masked static-shape NMS, anchor/box ops, bilinear
                   resampling; every Pallas kernel has a jnp reference twin.
- ``extractors`` — the visual region-feature backends (grid ResNet, ROI ResNet,
                   DINOv2 ViT single/multi-layer, CLIP, Faster R-CNN family),
                   all batched + jitted (the reference loops per image).
- ``data``       — host input pipeline: LMDB (native C++ reader) / HDF5 /
                   on-the-fly extraction, WordPiece tokenization, async
                   double-buffered sharded device feed.
- ``training``   — jitted train/eval engine: optax AdamW + warmup-linear,
                   CE/focal/label-smoothing losses, early stopping on AUROC,
                   Orbax checkpointing (full state, resumable).
- ``parallel``   — device-mesh construction and sharding rules (dp × mp) for
                   pjit/shard_map execution over ICI.
- ``pipelines``  — the named-pipeline user surface of the reference
                   (``vilbert_lmdb_train``, ``vilbert_resnet152_roi_train``, …).
"""

__version__ = "0.1.0"

from multimodal_classification_tpu import config as config  # noqa: F401
from multimodal_classification_tpu.registry import (  # noqa: F401
    MODEL_REGISTRY,
    FEATURE_EXTRACTOR_REGISTRY,
    PIPELINE_REGISTRY,
    register_model,
    register_feature_extractor,
    register_pipeline,
    get_model,
    get_feature_extractor,
    list_available_models,
    list_available_extractors,
)
