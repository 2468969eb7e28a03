"""Model-level convenience API.

Functional equivalents of the reference's BaseMultimodalModel methods
(reference: models/base.py:116-181 predict/predict_proba/freeze_layers/
save_pretrained/get_num_parameters) — in a functional framework these are
free functions over (model, params).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def predict_proba(logits: jnp.ndarray) -> jnp.ndarray:
    """Softmax probabilities (reference base.py:127-138)."""
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def predict(logits: jnp.ndarray) -> jnp.ndarray:
    """Argmax class predictions (reference base.py:116-125)."""
    return jnp.argmax(logits, axis=-1)


def get_num_parameters(params: Any) -> Tuple[int, int]:
    """(total, trainable) — trainable == total here; freezing is an optimizer
    partition (training.train.freeze_labels), not a param property."""
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    return n, n


def save_pretrained(directory: str, params: Any, config: Any = None):
    """Persist params (+ config json) — reference base.py:165-181."""
    from multimodal_classification_tpu.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(directory)
    ckpt.save("model", {"params": params})
    if config is not None:
        import dataclasses

        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(config), f, indent=2, default=str)


def load_pretrained(directory: str) -> Dict[str, Any]:
    from multimodal_classification_tpu.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(directory)
    out = ckpt.restore("model")
    cfg_path = os.path.join(directory, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            out["config"] = json.load(f)
    return out
