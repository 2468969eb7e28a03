"""Model layer: two-stream ViLBERT architectures + registry entries."""

from multimodal_classification_tpu.models import api as api  # noqa: F401
from multimodal_classification_tpu.models import vilbert as vilbert  # noqa: F401
from multimodal_classification_tpu.models.api import (  # noqa: F401
    get_num_parameters,
    load_pretrained,
    predict,
    predict_proba,
    save_pretrained,
)
from multimodal_classification_tpu.models.vilbert import (  # noqa: F401
    ViLBERTEncoder,
    ViLBERTForClassification,
    ViLBERTModel,
    dummy_batch,
    init_params,
)
