"""Fused attention-BLOCK Pallas kernel parity vs its XLA twin, plus
model-level wiring (config.fused_attn_block).

On the CPU test backend the kernel runs in interpreter mode; bench/TPU runs
exercise the compiled kernel. Model-level checks pin down that the flag
(a) leaves the param tree untouched, (b) reproduces the unfused logits, and
(c) composes with the int8 serving quantization.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_classification_tpu.ops.pallas_kernels import (
    fused_attn_block as ak,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    import multimodal_classification_tpu.ops.pallas_kernels as pk

    on_cpu = jax.devices()[0].platform != "tpu"
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=on_cpu))
    monkeypatch.setattr(pk, "on_tpu", lambda: True)


def _mk(rng, b, s, h, dtype=np.float32):
    x = jnp.asarray(rng.standard_normal((b, s, h)).astype(dtype))
    mask = np.ones((b, s), np.float32)
    mask[:, -2:] = 0.0
    key_bias = jnp.asarray((1.0 - mask) * ak.NEG_INF)
    ws = [jnp.asarray(rng.standard_normal((h, h)).astype(np.float32) * 0.05)
          for _ in range(4)]
    bs = [jnp.asarray(rng.standard_normal((h,)).astype(np.float32) * 0.1)
          for _ in range(4)]
    gamma = jnp.asarray(1.0 + rng.standard_normal(h).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.standard_normal(h).astype(np.float32) * 0.1)
    return x, key_bias, ws, bs, gamma, beta


def _quantize(w):
    """Per-output-channel symmetric int8, as ops.quant.build_quant_tree."""
    w = np.asarray(w, np.float32)
    s = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
    q = np.clip(np.rint(w / s[None, :]), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(s)


class TestKernel:
    @pytest.mark.parametrize("b,s,heads", [(4, 8, 2), (3, 8, 1), (2, 16, 2),
                                           (2, 10, 2), (1, 25, 2)])
    def test_matches_reference(self, rng, b, s, heads):
        h = 128
        x, key_bias, ws, bs, gamma, beta = _mk(rng, b, s, h)
        args = [x, key_bias]
        for w, bias in zip(ws, bs):
            args += [w, bias]
        got = ak.fused_attn_block(*args, gamma, beta, num_heads=heads)
        want = ak.block_reference(*args, gamma, beta, num_heads=heads)
        assert got.shape == (b, s, h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_mask_actually_masks(self, rng):
        """Changing a masked-out token's content must not change other rows."""
        b, s, h, heads = 2, 8, 128, 2
        x, key_bias, ws, bs, gamma, beta = _mk(rng, b, s, h)
        args = lambda xx: [xx, key_bias, ws[0], bs[0], ws[1], bs[1],  # noqa: E731
                           ws[2], bs[2], ws[3], bs[3]]
        base = ak.fused_attn_block(*args(x), gamma, beta, num_heads=heads)
        x2 = x.at[:, -1, :].set(7.7)  # masked position
        pert = ak.fused_attn_block(*args(x2), gamma, beta, num_heads=heads)
        np.testing.assert_allclose(np.asarray(base[:, :-2]),
                                   np.asarray(pert[:, :-2]),
                                   rtol=2e-5, atol=2e-5)

    def test_grad_flows_via_twin(self, rng):
        b, s, h, heads = 2, 8, 128, 2
        x, key_bias, ws, bs, gamma, beta = _mk(rng, b, s, h)

        def loss(x_, w0):
            y = ak.fused_attn_block(x_, key_bias, w0, bs[0], ws[1], bs[1],
                                    ws[2], bs[2], ws[3], bs[3], gamma, beta,
                                    num_heads=heads)
            return jnp.sum(y ** 2)

        g_x, g_w = jax.grad(loss, argnums=(0, 1))(x, ws[0])
        assert np.isfinite(np.asarray(g_x)).all()
        assert np.abs(np.asarray(g_w)).max() > 0

    def test_int8_matches_int8_reference_padded_seq(self, rng):
        """seq 10 pads to the 16-row tile in-kernel (the visual stream's
        100 regions pad to 112 the same way) — parity must survive it."""
        b, s, h, heads = 3, 10, 128, 2
        x, key_bias, ws, bs, gamma, beta = _mk(rng, b, s, h)
        qs = [_quantize(w) for w in ws]
        args = [x, key_bias]
        for (q, sc), bias in zip(qs, bs):
            args += [q, sc, bias]
        got = ak.fused_attn_block_int8(*args, gamma, beta, num_heads=heads)
        want = ak.block_int8_reference(*args, gamma, beta, num_heads=heads)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_visual_stream_padding_parity(self, rng):
        """config.visual_stream_padding pads the visual stream ONCE (10
        regions -> 16 here, like 100 -> 112 at the flagship) for the whole
        encoder; logits must match the unpadded unfused model exactly."""
        import dataclasses

        from multimodal_classification_tpu.config import tiny_vilbert_config
        from multimodal_classification_tpu.models.vilbert import (
            ViLBERTForClassification,
            dummy_batch,
        )

        cfg = tiny_vilbert_config(
            dtype="float32", use_pallas_attention=False,
            hidden_size=128, v_hidden_size=256, bi_hidden_size=128,
            intermediate_size=256, v_intermediate_size=512,
            num_attention_heads=2, v_num_attention_heads=2,
            bi_num_attention_heads=2,
        )
        base = ViLBERTForClassification(dataclasses.replace(
            cfg, fused_attn_block=False, fused_ffn=False,
            visual_stream_padding=False))
        padded = ViLBERTForClassification(dataclasses.replace(
            cfg, fused_attn_block=True, visual_stream_padding=True))
        batch = dummy_batch(cfg, 3, 8, 10)  # 10 regions: off the 16-row tile
        batch["visual_features"] = jnp.asarray(
            rng.standard_normal(batch["visual_features"].shape), jnp.float32)
        batch["visual_attention_mask"] = jnp.asarray(
            np.concatenate([np.ones((3, 9)), np.zeros((3, 1))], 1), jnp.float32)
        params = base.init(jax.random.key(0), **batch)["params"]
        a = base.apply({"params": params}, **batch, deterministic=True)["logits"]
        out = padded.apply({"params": params}, **batch, deterministic=True)
        b_ = out["logits"]
        assert out["visual_output"].shape[1] == 10  # sliced back
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)

    def test_int8_matches_int8_reference(self, rng):
        b, s, h, heads = 4, 8, 128, 2
        x, key_bias, ws, bs, gamma, beta = _mk(rng, b, s, h)
        qs = [_quantize(w) for w in ws]
        args = [x, key_bias]
        for (q, sc), bias in zip(qs, bs):
            args += [q, sc, bias]
        got = ak.fused_attn_block_int8(*args, gamma, beta, num_heads=heads)
        want = ak.block_int8_reference(*args, gamma, beta, num_heads=heads)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_int8_close_to_float(self, rng):
        b, s, h, heads = 2, 8, 128, 2
        x, key_bias, ws, bs, gamma, beta = _mk(rng, b, s, h)
        f_args = [x, key_bias]
        q_args = [x, key_bias]
        for w, bias in zip(ws, bs):
            f_args += [w, bias]
            q, sc = _quantize(w)
            q_args += [q, sc, bias]
        f = ak.fused_attn_block(*f_args, gamma, beta, num_heads=heads)
        q = ak.fused_attn_block_int8(*q_args, gamma, beta, num_heads=heads)
        # int8 quantization noise, post-LayerNorm: loose but meaningful bound
        assert np.abs(np.asarray(f) - np.asarray(q)).max() < 0.3


class TestModelWiring:
    @pytest.fixture()
    def model_pair(self, rng):
        import dataclasses

        from multimodal_classification_tpu.config import tiny_vilbert_config
        from multimodal_classification_tpu.models.vilbert import (
            ViLBERTForClassification,
            dummy_batch,
        )

        # hidden sizes must be lane-aligned for the kernel to dispatch
        cfg = tiny_vilbert_config(
            dtype="float32", use_pallas_attention=False,
            hidden_size=128, v_hidden_size=128, bi_hidden_size=128,
            intermediate_size=256, v_intermediate_size=256,
            num_attention_heads=2, v_num_attention_heads=2,
            bi_num_attention_heads=2,
        )
        base = ViLBERTForClassification(cfg)
        fused = ViLBERTForClassification(
            dataclasses.replace(cfg, fused_attn_block=True))
        batch = dummy_batch(cfg, 3, 8, 8)
        batch["attention_mask"] = jnp.asarray(
            np.concatenate([np.ones((3, 6)), np.zeros((3, 2))], 1), jnp.float32)
        batch["visual_features"] = jnp.asarray(
            rng.standard_normal(batch["visual_features"].shape), jnp.float32)
        params = base.init(jax.random.key(0), **batch)["params"]
        return base, fused, params, batch

    def test_param_tree_untouched_and_logits_match(self, model_pair):
        base, fused, params, batch = model_pair
        p2 = fused.init(jax.random.key(0), **batch)["params"]
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
        a = base.apply({"params": params}, **batch, deterministic=True)["logits"]
        b = fused.apply({"params": params}, **batch, deterministic=True)["logits"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    def test_training_path_unchanged(self, model_pair):
        """deterministic=False must not dispatch the fused block (dropout)."""
        base, fused, params, batch = model_pair
        a = base.apply({"params": params}, **batch, deterministic=False,
                       rngs={"dropout": jax.random.key(9)})["logits"]
        b = fused.apply({"params": params}, **batch, deterministic=False,
                        rngs={"dropout": jax.random.key(9)})["logits"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    def test_int8_quant_composes(self, model_pair):
        from multimodal_classification_tpu.ops.quant import build_quant_tree

        base, fused, params, batch = model_pair
        quant = build_quant_tree(params, min_dim=64)
        a = base.apply({"params": params, "quant": quant}, **batch,
                       deterministic=True)["logits"]
        b = fused.apply({"params": params, "quant": quant}, **batch,
                        deterministic=True)["logits"]
        # identical quantized weights; fused path quantizes the input once
        # for q/k/v (same scales) — predictions must agree
        assert (np.argmax(np.asarray(a), -1) == np.argmax(np.asarray(b), -1)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-2)
