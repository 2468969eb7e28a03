"""Reproducibility: identical seeds → identical training trajectories
(parameters and history), on both the host-fed and device-resident paths."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_classification_tpu.config import (
    DataConfig,
    ExperimentConfig,
    TrainingConfig,
    tiny_vilbert_config,
)
from multimodal_classification_tpu.models.vilbert import ViLBERTForClassification
from multimodal_classification_tpu.training.train import Trainer, model_inputs
from tests.test_training import _synthetic_batches


def _run(tmp_path, tag):
    cfg = tiny_vilbert_config(dtype="float32", use_pallas_attention=False)
    tcfg = TrainingConfig(
        batch_size=16, num_epochs=2, learning_rate=5e-4, warmup_steps=2,
        mesh_shape=(-1, 1), checkpoint_dir=str(tmp_path / tag),
    )
    ex = ExperimentConfig(name=tag, model=cfg, training=tcfg, data=DataConfig())
    model = ViLBERTForClassification(cfg)
    train_b = _synthetic_batches(cfg, 4, 16, seed=0)
    val_b = _synthetic_batches(cfg, 2, 16, seed=1)
    trainer = Trainer(model, ex, checkpoint_dir=str(tmp_path / tag))
    params = model.init(jax.random.key(0), **model_inputs(train_b[0]))["params"]
    state, history = trainer.fit(
        lambda: iter(train_b), lambda: iter(val_b),
        steps_per_epoch=len(train_b), init_params=params,
    )
    return state, history


def test_same_seed_same_trajectory(tmp_path):
    s1, h1 = _run(tmp_path, "a")
    s2, h2 = _run(tmp_path, "b")
    np.testing.assert_array_equal(
        np.asarray(h1["train_loss"]), np.asarray(h2["train_loss"])
    )
    np.testing.assert_array_equal(
        np.asarray(h1["val_auroc"]), np.asarray(h2["val_auroc"])
    )
    k1 = np.asarray(s1.params["classifier_out"]["kernel"])
    k2 = np.asarray(s2.params["classifier_out"]["kernel"])
    np.testing.assert_array_equal(k1, k2)
