from multimodal_classification_tpu.serving.export import (  # noqa: F401
    ExportedServingModel,
    export_artifact,
    load_artifact,
)
from multimodal_classification_tpu.serving.server import (  # noqa: F401
    InferenceServer,
    ServingModel,
)
