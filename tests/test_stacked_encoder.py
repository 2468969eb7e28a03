"""Scan-over-layers encoder (config.stacked_encoder, models/stacking.py).

The stacked encoder must be the SAME function as the unrolled one — these
tests pin forward parity through the exact param-layout transforms, the
round-trip of those transforms, trainability (grads reach every stacked
leaf), TP sharding of stacked leaves, and the freeze incompatibility guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_classification_tpu.config import tiny_vilbert_config
from multimodal_classification_tpu.models.stacking import (
    stack_encoder_params,
    unstack_encoder_params,
)
from multimodal_classification_tpu.models.vilbert import (
    ViLBERTForClassification,
    dummy_batch,
    stackable_layout,
)


def _models(**overrides):
    base = dict(dtype="float32", use_pallas_attention=False, fused_ffn=False)
    base.update(overrides)
    cfg = tiny_vilbert_config(**base)
    cfg_s = tiny_vilbert_config(**base, stacked_encoder=True)
    return ViLBERTForClassification(cfg), ViLBERTForClassification(cfg_s), cfg


@pytest.fixture(scope="module")
def setup():
    model, model_s, cfg = _models()
    batch = dummy_batch(cfg, batch_size=2, seq_len=8, num_regions=5)
    batch["input_ids"] = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 8)), jnp.int32
    )
    batch["visual_features"] = jnp.asarray(
        np.random.default_rng(1).standard_normal(batch["visual_features"].shape),
        jnp.float32,
    )
    params = model.init(jax.random.key(0), **batch)["params"]
    return model, model_s, cfg, batch, params


class TestLayout:
    def test_flagship_layouts_are_stackable(self):
        from multimodal_classification_tpu.config import (
            core_vilbert_config,
            facebook_vilbert_config,
        )

        assert stackable_layout(facebook_vilbert_config())
        assert stackable_layout(core_vilbert_config())
        assert stackable_layout(tiny_vilbert_config())

    def test_irregular_layout_refuses(self):
        cfg = tiny_vilbert_config(co_attention_text_layers=(0, 3))
        assert not stackable_layout(cfg)
        # the model still runs (falls back to the unrolled path)
        model = ViLBERTForClassification(
            tiny_vilbert_config(
                dtype="float32", co_attention_text_layers=(0, 3),
                stacked_encoder=True, use_pallas_attention=False,
            )
        )
        batch = dummy_batch(model.cfg, 1, 4, 3)
        params = model.init(jax.random.key(0), **batch)["params"]
        assert "stack" not in params["bert"]["encoder"]

    def test_roundtrip_exact(self, setup):
        _, _, _, _, params = setup
        stacked = stack_encoder_params(params)
        enc = stacked["bert"]["encoder"]
        assert set(enc) == {"stack"}
        k = jax.tree.leaves(enc["stack"]["v"])[0].shape[0]
        assert k == 2
        back = unstack_encoder_params(stacked)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            params, back,
        )

    def test_transforms_are_idempotent_on_target_layout(self, setup):
        _, _, _, _, params = setup
        assert stack_encoder_params(stack_encoder_params(params)) is not None
        assert unstack_encoder_params(params) == params


class TestParity:
    def test_forward_parity_eval(self, setup):
        model, model_s, _, batch, params = setup
        ref = model.apply({"params": params}, **batch, deterministic=True)
        stacked = stack_encoder_params(params)
        # shape check: the stacked init tree matches the transformed tree
        init_s = model_s.init(jax.random.key(1), **batch)["params"]
        jax.tree.map(
            lambda a, b: (a.shape, a.dtype) == (b.shape, b.dtype) or pytest.fail(
                f"shape/dtype mismatch {a.shape}/{a.dtype} vs {b.shape}/{b.dtype}"
            ),
            init_s, stacked,
        )
        got = model_s.apply({"params": stacked}, **batch, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(got["logits"]), np.asarray(ref["logits"]), rtol=0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got["text_output"]), np.asarray(ref["text_output"]), atol=1e-4
        )

    def test_forward_parity_core_variant(self):
        from multimodal_classification_tpu.config import ViLBERTConfig

        base = dict(
            dtype="float32", use_pallas_attention=False, fused_ffn=False,
            vocab_size=64, hidden_size=32, num_hidden_layers=4,
            num_attention_heads=4, intermediate_size=64, v_feature_size=16,
            v_hidden_size=32, v_num_attention_heads=4, v_num_hidden_layers=2,
            v_intermediate_size=64, bi_hidden_size=32, bi_num_attention_heads=4,
            co_attention_text_layers=(1, 3), classifier_hidden_size=16,
            pooling="cls_mean", v_use_position_embeddings=True,
        )
        model = ViLBERTForClassification(ViLBERTConfig(**base))
        model_s = ViLBERTForClassification(ViLBERTConfig(**base, stacked_encoder=True))
        batch = dummy_batch(model.cfg, 2, 6, 4)
        params = model.init(jax.random.key(0), **batch)["params"]
        ref = model.apply({"params": params}, **batch, deterministic=True)
        got = model_s.apply(
            {"params": stack_encoder_params(params)}, **batch, deterministic=True
        )
        np.testing.assert_allclose(
            np.asarray(got["logits"]), np.asarray(ref["logits"]), atol=1e-5
        )

    def test_gradients_reach_every_stacked_leaf(self, setup):
        model, model_s, _, batch, params = setup
        stacked = stack_encoder_params(params)

        def loss(p):
            out = model_s.apply(
                {"params": p}, **batch, deterministic=False,
                rngs={"dropout": jax.random.key(2)},
            )
            return jnp.mean(out["logits"] ** 2)

        grads = jax.grad(loss)(stacked)
        flat = jax.tree_util.tree_flatten_with_path(
            grads["bert"]["encoder"]["stack"]
        )[0]
        assert flat
        for path, g in flat:
            assert np.isfinite(np.asarray(g)).all()
            assert float(jnp.abs(g).max()) > 0.0, path

    def test_grad_parity_with_unstacked(self, setup):
        model, model_s, _, batch, params = setup

        def loss(m, p):
            out = m.apply({"params": p}, **batch, deterministic=True)
            return jnp.mean(out["logits"] ** 2)

        g_ref = jax.grad(lambda p: loss(model, p))(params)
        g_stk = jax.grad(lambda p: loss(model_s, p))(stack_encoder_params(params))
        g_stk_canon = unstack_encoder_params(g_stk)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            ),
            g_ref, g_stk_canon,
        )


class TestIntegration:
    def test_tp_shardings_on_stacked_leaves(self, setup):
        from jax.sharding import PartitionSpec as P

        from multimodal_classification_tpu.parallel.mesh import (
            build_mesh,
            param_shardings,
        )

        _, _, _, _, params = setup
        mesh = build_mesh((2, 4))
        sh = param_shardings(stack_encoder_params(params), mesh)
        flat = jax.tree_util.tree_flatten_with_path(sh)[0]
        specs = {
            "/".join(str(p.key) for p in path if hasattr(p, "key")): s.spec
            for path, s in flat
        }
        qk = specs["bert/encoder/stack/t_a/attention/query/kernel"]
        assert qk == P(None, None, "mp")
        out = specs["bert/encoder/stack/t_a/output/dense/kernel"]
        assert out == P(None, "mp", None)

    def test_freeze_guard(self, setup):
        from multimodal_classification_tpu.training.train import freeze_labels

        _, _, _, _, params = setup
        with pytest.raises(ValueError, match="stacked_encoder"):
            freeze_labels(stack_encoder_params(params), 2)
        # canonical layout still freezes fine
        labels = freeze_labels(params, 2)
        assert "freeze" in jax.tree.leaves(labels)

    def test_train_step_runs_stacked(self, setup):
        import optax

        _, model_s, _, batch, params = setup
        stacked = stack_encoder_params(params)
        tx = optax.adamw(1e-4)
        opt = tx.init(stacked)

        def step(p, o, rng):
            def loss(p):
                out = model_s.apply(
                    {"params": p}, **batch, deterministic=False,
                    rngs={"dropout": rng},
                )
                logits = out["logits"]
                return -jnp.mean(jax.nn.log_softmax(logits)[:, 0])

            l, g = jax.value_and_grad(loss)(p)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o, l

        p2, opt, l1 = jax.jit(step)(stacked, opt, jax.random.key(3))
        p3, opt, l2 = jax.jit(step)(p2, opt, jax.random.key(4))
        assert np.isfinite(float(l1)) and np.isfinite(float(l2))
        d = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), stacked, p2
        )
        assert max(jax.tree.leaves(d)) > 0.0
