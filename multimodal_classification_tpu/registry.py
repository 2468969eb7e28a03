"""Component registries.

TPU-native re-design of the reference's decorator registries
(reference: src/multimodalclassification/models/base.py:272-342). Instead of
torch ``nn.Module`` classes, entries are factories returning functional
components (Flax modules / extractor objects / pipeline callables).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {}
FEATURE_EXTRACTOR_REGISTRY: Dict[str, Callable[..., Any]] = {}
PIPELINE_REGISTRY: Dict[str, Callable[..., Any]] = {}
LOSS_REGISTRY: Dict[str, Callable[..., Any]] = {}


def _make_register(registry: Dict[str, Callable[..., Any]], kind: str):
    def register(name: str):
        def deco(fn):
            if name in registry:
                raise ValueError(f"{kind} '{name}' already registered")
            registry[name] = fn
            return fn

        return deco

    return register


register_model = _make_register(MODEL_REGISTRY, "model")
register_feature_extractor = _make_register(FEATURE_EXTRACTOR_REGISTRY, "feature extractor")
register_pipeline = _make_register(PIPELINE_REGISTRY, "pipeline")
register_loss = _make_register(LOSS_REGISTRY, "loss")


def _get(registry: Dict[str, Callable[..., Any]], kind: str, name: str, **kwargs):
    if name not in registry:
        known = ", ".join(sorted(registry)) or "<none>"
        raise KeyError(f"Unknown {kind} '{name}'. Available: {known}")
    return registry[name](**kwargs)


def get_model(name: str, **kwargs):
    """Instantiate a registered model by name (reference: models/base.py:311)."""
    import multimodal_classification_tpu.models  # noqa: F401  (populate registry)

    return _get(MODEL_REGISTRY, "model", name, **kwargs)


def get_feature_extractor(name: str, **kwargs):
    """Instantiate a registered feature extractor (reference: models/base.py:325)."""
    import multimodal_classification_tpu.extractors  # noqa: F401

    return _get(FEATURE_EXTRACTOR_REGISTRY, "feature extractor", name, **kwargs)


def get_loss(name: str, **kwargs):
    import multimodal_classification_tpu.training.losses  # noqa: F401

    return _get(LOSS_REGISTRY, "loss", name, **kwargs)


def get_pipeline(name: str):
    import multimodal_classification_tpu.pipelines  # noqa: F401

    if name not in PIPELINE_REGISTRY:
        known = ", ".join(sorted(PIPELINE_REGISTRY)) or "<none>"
        raise KeyError(f"Unknown pipeline '{name}'. Available: {known}")
    return PIPELINE_REGISTRY[name]


def list_available_models() -> list[str]:
    import multimodal_classification_tpu.models  # noqa: F401

    return sorted(MODEL_REGISTRY)


def list_available_extractors() -> list[str]:
    import multimodal_classification_tpu.extractors  # noqa: F401

    return sorted(FEATURE_EXTRACTOR_REGISTRY)


def list_available_pipelines() -> list[str]:
    import multimodal_classification_tpu.pipelines  # noqa: F401

    return sorted(PIPELINE_REGISTRY)
