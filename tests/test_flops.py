"""FLOP accounting cross-checks (utils/flops.py).

The analytic matmul count must sit slightly BELOW XLA's own
``cost_analysis()['flops']`` (which adds the elementwise/softmax tail) and
within a modest factor of it — a wrong layer inventory or a missed 2× would
blow these bounds immediately.
"""

import jax
import numpy as np
import optax

from multimodal_classification_tpu.config import (
    facebook_vilbert_config,
    tiny_vilbert_config,
)
from multimodal_classification_tpu.models.vilbert import (
    ViLBERTForClassification,
    dummy_batch,
)
from multimodal_classification_tpu.training.losses import get_loss_function
from multimodal_classification_tpu.training.train import (
    TrainState,
    make_eval_step,
    make_train_step,
    model_inputs,
)
from multimodal_classification_tpu.utils.flops import (
    forward_matmul_flops,
    train_mfu,
    train_step_matmul_flops,
)


def _xla_flops(lowered) -> float:
    ca = lowered.compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca["flops"])


def _tiny():
    cfg = tiny_vilbert_config(dtype="float32", use_pallas_attention=False,
                              v_feature_size=32)
    model = ViLBERTForClassification(cfg)
    B, s, r = 8, 16, 12
    batch = dummy_batch(cfg, B, s, r)
    params = model.init(jax.random.key(0), **model_inputs(batch))["params"]
    return cfg, model, params, batch, (B, s, r)


def test_forward_count_brackets_xla():
    cfg, model, params, batch, (B, s, r) = _tiny()
    lowered = jax.jit(make_eval_step(model)).lower(params, model_inputs(batch))
    xla = _xla_flops(lowered)
    analytic = forward_matmul_flops(cfg, B, s, r)
    # matmul-only analytic ≤ XLA total, and the elementwise tail is bounded
    assert 1.0 <= xla / analytic <= 1.4, (xla, analytic)


def test_train_step_count_brackets_xla():
    cfg, model, params, batch, (B, s, r) = _tiny()
    loss_fn = get_loss_function("ce")
    tx = optax.adamw(1e-3)
    state = TrainState(jax.numpy.zeros((), jax.numpy.int32), params,
                       tx.init(params))
    step = make_train_step(model, loss_fn, tx)
    full = dict(batch, labels=np.zeros(8, np.int32))
    lowered = jax.jit(step).lower(state, full, jax.random.key(1, impl="rbg"))
    xla = _xla_flops(lowered)
    analytic = train_step_matmul_flops(cfg, B, s, r)
    # bwd = 2× fwd is the standard identity; XLA adds optimizer/elementwise.
    # The rbg dropout PRNG inflates XLA's nominal count somewhat, hence the
    # looser ceiling than the eval-side bound.
    assert 0.95 <= xla / analytic <= 1.75, (xla, analytic)


def test_flagship_numbers_are_stable():
    """The published accounting (docs/PERFORMANCE.md): ~73 GFLOP/meme
    fwd+bwd at the flagship config (batch 16, 32-token bucket, 100 regions).
    A change to this number means the model math changed — update the doc."""
    cfg = facebook_vilbert_config()
    per_meme = train_step_matmul_flops(cfg, 16, 32, 100) / 16
    assert abs(per_meme / 1e9 - 73.27) < 1.0, per_meme
    m = train_mfu(cfg, 750.0, 16, 32, 100)
    assert 0.25 < m["train_mfu_vs_nominal"] < 0.31
    assert 0.40 < m["train_mfu_vs_measured_ceiling"] < 0.49


def test_breakdown_sums():
    cfg = facebook_vilbert_config()
    bd = {}
    total = forward_matmul_flops(cfg, 16, 32, 100, bd)
    assert sum(bd.values()) == total
    # co-attention is the dominant block at the flagship shapes
    assert bd["c_layers"] > bd["v_layers"] > bd["t_layers"] > bd["head"]
