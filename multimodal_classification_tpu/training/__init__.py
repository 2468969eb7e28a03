"""Training engine: losses, schedules, metrics, jitted train/eval loop."""

from multimodal_classification_tpu.training import losses as losses  # noqa: F401
from multimodal_classification_tpu.training.losses import get_loss_function  # noqa: F401
from multimodal_classification_tpu.training.metrics import auroc, binary_metrics  # noqa: F401
from multimodal_classification_tpu.training.schedule import warmup_linear_schedule  # noqa: F401
from multimodal_classification_tpu.training.train import (  # noqa: F401
    Trainer,
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
