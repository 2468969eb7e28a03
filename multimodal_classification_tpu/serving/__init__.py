from multimodal_classification_tpu.serving.server import (  # noqa: F401
    InferenceServer,
    ServingModel,
)
