"""Training-step parity vs the reference torch trainer.

Forward parity (test_convert_parity.py) gates the architecture math; this
gates the REST of the training numerics end-to-end: autodiff backward,
global-norm clipping at 1.0, AdamW (eps 1e-8, decoupled decay 0.01 on all
params — torch default, reference nodes.py:757), and the warmup-linear
schedule (reference nodes.py:699-709) — by running the same weights, same
batches, dropout off, three optimizer steps on both sides and comparing
losses and parameters.
"""

import numpy as np
import pytest
import torch

from multimodal_classification_tpu.config import TrainingConfig, tiny_vilbert_config
from multimodal_classification_tpu.models.convert import (
    convert_facebook_vilbert,
    merge_params,
)
from multimodal_classification_tpu.models.vilbert import (
    ViLBERTForClassification,
    dummy_batch,
)
from tests.test_convert_parity import _load_reference_arch

import jax
import jax.numpy as jnp


N_STEPS = 3
BASE_LR = 1e-3
WARMUP = 2
TOTAL = 10


def _batches(cfg, rng, n_steps, b=2, s=12, n=6):
    out = []
    for _ in range(n_steps):
        out.append({
            "input_ids": rng.integers(0, cfg.vocab_size, (b, s)),
            "attention_mask": np.ones((b, s), np.float32),
            "token_type_ids": np.zeros((b, s), np.int64),
            "visual_features": rng.standard_normal((b, n, cfg.v_feature_size)).astype(np.float32),
            "visual_attention_mask": np.ones((b, n), np.float32),
            "spatial_locations": rng.uniform(0, 1, (b, n, 5)).astype(np.float32),
            "labels": np.asarray([0, 1], np.int64),
        })
    return out


@pytest.fixture(scope="module")
def trained_pair(rng_module=None):
    ref = _load_reference_arch()
    cfg = tiny_vilbert_config(
        dtype="float32", use_pallas_attention=False, max_position_embeddings=512,
        vocab_size=30522,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0,
    )
    ref_config = {
        "hidden_size": cfg.hidden_size,
        "num_attention_heads": cfg.num_attention_heads,
        "num_hidden_layers": cfg.num_hidden_layers,
        "intermediate_size": cfg.intermediate_size,
        "hidden_dropout_prob": 0.0,
        "attention_probs_dropout_prob": 0.0,
        "max_position_embeddings": cfg.max_position_embeddings,
        "vocab_size": cfg.vocab_size,
        "v_hidden_size": cfg.v_hidden_size,
        "v_num_attention_heads": cfg.v_num_attention_heads,
        "v_num_hidden_layers": cfg.v_num_hidden_layers,
        "v_intermediate_size": cfg.v_intermediate_size,
        "v_hidden_dropout_prob": 0.0,
        "v_attention_probs_dropout_prob": 0.0,
        "num_co_attention_layers": len(cfg.co_attention_text_layers),
        "bi_hidden_size": cfg.bi_hidden_size,
        "v_feature_size": cfg.v_feature_size,
        "v_loc_size": cfg.v_loc_size,
    }
    torch.manual_seed(0)
    tmodel = ref.ViLBERTForClassification(ref_config, num_labels=cfg.num_labels)
    # eval(), not train(): the reference hardcodes classifier-head dropout 0.1
    # (vilbert_facebook_arch.py:572-578) independent of the config probs, so
    # train mode is stochastic even at zero dropout config. eval() switches
    # dropout off while gradients still flow — the update chain under test
    # (backward → clip → AdamW → schedule) is unchanged.
    tmodel.eval()

    fmodel = ViLBERTForClassification(cfg)
    init = fmodel.init(jax.random.key(0), **dummy_batch(cfg, 2, 12, 6))["params"]
    loaded = convert_facebook_vilbert(tmodel.state_dict(), cfg)
    params, n_loaded, n_total = merge_params(init, loaded)
    assert n_loaded == n_total
    # copy NOW: the converter's numpy arrays share memory with the live
    # torch parameters (state_dict returns views), the torch optimizer below
    # mutates them in place, and jnp.asarray on the CPU backend zero-copy
    # aliases numpy buffers
    params = jax.tree.map(lambda v: jnp.array(np.array(v, copy=True)), params)

    batches = _batches(cfg, np.random.default_rng(7), N_STEPS)

    # ---- torch side: the reference train loop (nodes.py:749-799) ----
    opt = torch.optim.AdamW(tmodel.parameters(), lr=BASE_LR, eps=1e-8)
    # reference warmup-linear lambda, nodes.py:699-709
    def lr_lambda(step):
        if step < WARMUP:
            return step / max(1, WARMUP)
        return max(0.0, (TOTAL - step) / max(1, TOTAL - WARMUP))

    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda)
    ce = torch.nn.CrossEntropyLoss()
    t_losses = []
    for batch in batches:
        opt.zero_grad()
        out = tmodel(
            input_ids=torch.from_numpy(batch["input_ids"]),
            attention_mask=torch.from_numpy(batch["attention_mask"]),
            token_type_ids=torch.from_numpy(batch["token_type_ids"]),
            visual_features=torch.from_numpy(batch["visual_features"]),
            visual_attention_mask=torch.from_numpy(batch["visual_attention_mask"]),
            spatial_locations=torch.from_numpy(batch["spatial_locations"]),
        )
        loss = ce(out["logits"], torch.from_numpy(batch["labels"]))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tmodel.parameters(), 1.0)
        opt.step()
        sched.step()
        t_losses.append(float(loss.detach()))

    # ---- our side: the Trainer's exact optimizer (make_optimizer) driving a
    # deterministic step (mirror of make_train_step with dropout off, to
    # match the torch eval-mode forward above) ----
    import optax

    from multimodal_classification_tpu.training.losses import get_loss_function
    from multimodal_classification_tpu.training.train import (
        TrainState,
        make_optimizer,
        model_inputs,
    )

    tcfg = TrainingConfig(
        learning_rate=BASE_LR, warmup_steps=WARMUP, gradient_clip=1.0,
        weight_decay=0.01, adam_mu_dtype="float32", adam_nu_dtype="float32",
    )
    tx = make_optimizer(tcfg, total_steps=TOTAL)
    loss_fn = get_loss_function("ce")

    @jax.jit
    def det_step(state, batch):
        def loss_of(p):
            out = fmodel.apply({"params": p}, **model_inputs(batch),
                               deterministic=True)
            return loss_fn(out["logits"], batch["labels"], None)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, opt_state), loss

    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    f_losses = []
    for batch in batches:
        jbatch = {
            **{k: jnp.asarray(v) for k, v in batch.items()},
            "input_ids": jnp.asarray(batch["input_ids"], jnp.int32),
            "token_type_ids": jnp.asarray(batch["token_type_ids"], jnp.int32),
            "labels": jnp.asarray(batch["labels"], jnp.int32),
        }
        state, loss = det_step(state, jbatch)
        f_losses.append(float(loss))

    return tmodel, state, t_losses, f_losses


def test_losses_match_per_step(trained_pair):
    """Steps 2..N see params updated by clip+AdamW+schedule — loss agreement
    means the whole update chain matches the reference."""
    _, _, t_losses, f_losses = trained_pair
    np.testing.assert_allclose(f_losses, t_losses, rtol=2e-4, atol=2e-5)


def test_params_match_after_training(trained_pair):
    tmodel, state, _, _ = trained_pair
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    p = state.params

    checks = [
        # (torch key, transpose, our leaf)
        ("classifier.4.weight", True, p["classifier_out"]["kernel"]),
        ("classifier.1.weight", True, p["classifier_dense"]["kernel"]),
        ("bert.v_pooler.dense.bias", False, p["bert"]["v_pooler"]["dense"]["bias"]),
    ]
    for key, transpose, ours in checks:
        want = sd[key].T if transpose else sd[key]
        np.testing.assert_allclose(np.asarray(ours), want, rtol=5e-3, atol=5e-5,
                                   err_msg=key)
