"""Gradient accumulation (optax.MultiSteps) test: params update only every k
micro-steps and training remains finite/functional."""

import jax
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


def test_grad_accum_updates_every_k_steps(tmp_path):
    cfg = tiny_vilbert_config(dtype="float32", use_pallas_attention=False)
    tcfg = TrainingConfig(
        batch_size=8, num_epochs=1, learning_rate=1e-3, warmup_steps=0,
        grad_accum_steps=2, mesh_shape=(-1, 1),
        checkpoint_dir=str(tmp_path),
    )
    ex = ExperimentConfig(name="ga", model=cfg, training=tcfg, data=DataConfig())
    model = ViLBERTForClassification(cfg)
    batches = _synthetic_batches(cfg, 4, 8, seed=0)
    trainer = Trainer(model, ex, checkpoint_dir=str(tmp_path))
    params = model.init(jax.random.key(0), **model_inputs(batches[0]))["params"]
    state, step, _ = trainer.init_state(params, total_steps=10)
    rng = jax.random.key(1, impl="rbg")

    p0 = np.asarray(state.params["classifier_out"]["kernel"])
    state, _ = step(state, trainer.put_batch(batches[0]), rng)
    p1 = np.asarray(state.params["classifier_out"]["kernel"])
    np.testing.assert_array_equal(p0, p1)  # first micro-step: accumulate only
    state, _ = step(state, trainer.put_batch(batches[1]), rng)
    p2 = np.asarray(state.params["classifier_out"]["kernel"])
    assert not np.array_equal(p1, p2)  # second micro-step applies the update
    assert np.all(np.isfinite(p2))
