"""Fused whole-TEXT-LAYER int8 Pallas kernel: parity vs its XLA twin, vs the
two-kernel (attn-block + FFN) chain it replaces, and model-level wiring
(config.fused_text_layer).

On the CPU test backend the kernel runs in interpreter mode; bench/TPU runs
exercise the compiled kernel. The twin is BY CONSTRUCTION the composition of
the two kernels' twins, so the decisive checks here are (a) kernel == twin,
(b) kernel == the actual two-KERNEL path, (c) the model flag leaves params
untouched, falls back on the float path, and agrees with the unfused int8
predictions while actually dispatching.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_classification_tpu.ops.pallas_kernels import (
    fused_attn_block as ak,
    fused_ffn as fk,
    fused_layer as lk,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    import multimodal_classification_tpu.ops.pallas_kernels as pk

    on_cpu = jax.devices()[0].platform != "tpu"
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=on_cpu))
    monkeypatch.setattr(pk, "on_tpu", lambda: True)


def _quantize(w):
    """Per-output-channel symmetric int8, as ops.quant.build_quant_tree."""
    w = np.asarray(w, np.float32)
    s = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
    q = np.clip(np.rint(w / s[None, :]), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(s)


def _mk(rng, b, s, h, inter):
    x = jnp.asarray(rng.standard_normal((b, s, h)).astype(np.float32))
    mask = np.ones((b, s), np.float32)
    mask[:, -2:] = 0.0
    key_bias = jnp.asarray((1.0 - mask) * ak.NEG_INF)
    attn = []
    for _ in range(4):
        q, sc = _quantize(rng.standard_normal((h, h)).astype(np.float32) * 0.05)
        attn += [q, sc,
                 jnp.asarray(rng.standard_normal((h,)).astype(np.float32) * 0.1)]
    q1, s1 = _quantize(rng.standard_normal((h, inter)).astype(np.float32) * 0.05)
    bf1 = jnp.asarray(rng.standard_normal((inter,)).astype(np.float32) * 0.1)
    q2, s2 = _quantize(rng.standard_normal((inter, h)).astype(np.float32) * 0.05)
    bf2 = jnp.asarray(rng.standard_normal((h,)).astype(np.float32) * 0.1)
    ln = lambda: (  # noqa: E731
        jnp.asarray(1.0 + rng.standard_normal(h).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal(h).astype(np.float32) * 0.1),
    )
    g1, b1 = ln()
    g2, b2 = ln()
    return x, key_bias, attn, (g1, b1), (q1, s1, bf1, q2, s2, bf2), (g2, b2)


class TestKernel:
    @pytest.mark.parametrize("b,s,heads", [(4, 8, 2), (3, 8, 1), (2, 16, 2),
                                           (2, 10, 2), (1, 25, 2)])
    def test_matches_reference(self, rng, b, s, heads):
        h, inter = 128, 256
        x, kb, attn, (g1, b1), ffn, (g2, b2) = _mk(rng, b, s, h, inter)
        got = lk.fused_layer_int8(x, kb, *attn, g1, b1, *ffn, g2, b2,
                                  num_heads=heads)
        want = lk.layer_int8_reference(x, kb, *attn, g1, b1, *ffn, g2, b2,
                                       num_heads=heads)
        assert got.shape == (b, s, h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_two_kernel_chain(self, rng):
        """The fused layer must reproduce the exact attn-block-kernel →
        FFN-kernel → residual-LN chain it replaces (including the compute-
        dtype rounding of h between the two kernels)."""
        b, s, heads, h, inter = 2, 8, 2, 128, 256
        x, kb, attn, (g1, b1), ffn, (g2, b2) = _mk(rng, b, s, h, inter)
        got = lk.fused_layer_int8(x, kb, *attn, g1, b1, *ffn, g2, b2,
                                  num_heads=heads)
        h_blk = ak.fused_attn_block_int8(x, kb, *attn, g1, b1, num_heads=heads)
        y = fk.fused_ffn_int8(h_blk, *ffn)
        want = (ak._layernorm_f32(
            y.astype(jnp.float32) + h_blk.astype(jnp.float32),
            g2.astype(jnp.float32)[None, None, :],
            b2.astype(jnp.float32)[None, None, :],
        )).astype(x.dtype)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_mask_actually_masks(self, rng):
        """Changing a masked-out token must not change other rows' outputs."""
        b, s, heads, h, inter = 2, 8, 2, 128, 256
        x, kb, attn, (g1, b1), ffn, (g2, b2) = _mk(rng, b, s, h, inter)
        base = lk.fused_layer_int8(x, kb, *attn, g1, b1, *ffn, g2, b2,
                                   num_heads=heads)
        x2 = x.at[:, -1, :].set(7.7)  # masked position
        pert = lk.fused_layer_int8(x2, kb, *attn, g1, b1, *ffn, g2, b2,
                                   num_heads=heads)
        np.testing.assert_allclose(np.asarray(base[:, :-2]),
                                   np.asarray(pert[:, :-2]),
                                   rtol=1e-6, atol=1e-6)

    def test_supported_shapes(self):
        # flagship text layer fits; flagship visual layer must refuse
        assert lk.supported_layer(64, 32, 768, 3072, 12, jnp.bfloat16)
        assert not lk.supported_layer(64, 112, 1024, 4096, 8, jnp.bfloat16)
        # non-lane-aligned dims refuse
        assert not lk.supported_layer(4, 8, 96, 256, 2, jnp.float32)


class TestModelWiring:
    @pytest.fixture()
    def model_pair(self, rng):
        import dataclasses

        from multimodal_classification_tpu.config import tiny_vilbert_config
        from multimodal_classification_tpu.models.vilbert import (
            ViLBERTForClassification,
            dummy_batch,
        )

        # asymmetric dims (hidden != v_hidden != intermediate) so shape
        # plumbing bugs can't hide behind a symmetric tiny config
        cfg = tiny_vilbert_config(
            dtype="float32", use_pallas_attention=False,
            hidden_size=128, v_hidden_size=256, bi_hidden_size=128,
            intermediate_size=256, v_intermediate_size=384,
            num_attention_heads=2, v_num_attention_heads=2,
            bi_num_attention_heads=2,
        )
        base = ViLBERTForClassification(cfg)
        fused = ViLBERTForClassification(
            dataclasses.replace(cfg, fused_text_layer=True))
        batch = dummy_batch(cfg, 3, 8, 8)
        batch["attention_mask"] = jnp.asarray(
            np.concatenate([np.ones((3, 6)), np.zeros((3, 2))], 1), jnp.float32)
        batch["visual_features"] = jnp.asarray(
            rng.standard_normal(batch["visual_features"].shape), jnp.float32)
        params = base.init(jax.random.key(0), **batch)["params"]
        return base, fused, params, batch

    def test_param_tree_untouched_and_float_path_falls_back(self, model_pair):
        """No quant collection -> the probes tag 'float' -> the layer kernel
        refuses (bf16 weights don't fit VMEM at flagship dims) and the float
        logits are identical to the base model's."""
        base, fused, params, batch = model_pair
        p2 = fused.init(jax.random.key(0), **batch)["params"]
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
        a = base.apply({"params": params}, **batch, deterministic=True)["logits"]
        b = fused.apply({"params": params}, **batch, deterministic=True)["logits"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    def test_training_path_unchanged(self, model_pair):
        base, fused, params, batch = model_pair
        a = base.apply({"params": params}, **batch, deterministic=False,
                       rngs={"dropout": jax.random.key(9)})["logits"]
        b = fused.apply({"params": params}, **batch, deterministic=False,
                        rngs={"dropout": jax.random.key(9)})["logits"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    def test_int8_quant_dispatches_and_predictions_agree(self, model_pair,
                                                         monkeypatch):
        from multimodal_classification_tpu.ops.quant import build_quant_tree

        base, fused, params, batch = model_pair
        quant = build_quant_tree(params, min_dim=64)

        calls = []
        orig = lk.fused_layer_int8

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(lk, "fused_layer_int8", spy)
        a = base.apply({"params": params, "quant": quant}, **batch,
                       deterministic=True)["logits"]
        b = fused.apply({"params": params, "quant": quant}, **batch,
                        deterministic=True)["logits"]
        assert calls, "fused_text_layer never dispatched the layer kernel"
        assert (np.argmax(np.asarray(a), -1) == np.argmax(np.asarray(b), -1)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-2)
