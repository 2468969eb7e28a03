"""Fused co-attention DIRECTION Pallas kernel parity vs its XLA twin, plus
model-level wiring (config.fused_co_attn over the BiAttentionBlock)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_classification_tpu.ops.pallas_kernels import (
    fused_co_block as ck,
)
from multimodal_classification_tpu.ops.pallas_kernels.fused_attn_block import (
    NEG_INF,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    import multimodal_classification_tpu.ops.pallas_kernels as pk

    on_cpu = jax.devices()[0].platform != "tpu"
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=on_cpu))
    monkeypatch.setattr(pk, "on_tpu", lambda: True)


def _mk(rng, b, sq, sk, hq, hkv, bi):
    xq = jnp.asarray(rng.standard_normal((b, sq, hq)).astype(np.float32))
    xkv = jnp.asarray(rng.standard_normal((b, sk, hkv)).astype(np.float32))
    mask = np.ones((b, sk), np.float32)
    mask[:, -2:] = 0.0
    key_bias = jnp.asarray((1.0 - mask) * NEG_INF)
    w = lambda i, o: jnp.asarray(  # noqa: E731
        rng.standard_normal((i, o)).astype(np.float32) * 0.05)
    bvec = lambda o: jnp.asarray(  # noqa: E731
        rng.standard_normal((o,)).astype(np.float32) * 0.1)
    ws = [w(hq, bi), w(hkv, bi), w(hkv, bi), w(bi, hq)]
    bs = [bvec(bi), bvec(bi), bvec(bi), bvec(hq)]
    gamma = jnp.asarray(1.0 + rng.standard_normal(hq).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.standard_normal(hq).astype(np.float32) * 0.1)
    return xq, xkv, key_bias, ws, bs, gamma, beta


def _quantize(w):
    w = np.asarray(w, np.float32)
    s = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
    q = np.clip(np.rint(w / s[None, :]), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(s)


def _interleave(ws, bs):
    out = []
    for w, b in zip(ws, bs):
        out += [w, b]
    return out


class TestKernel:
    @pytest.mark.parametrize("b,sq,sk,hq,hkv", [
        (2, 8, 8, 128, 128),      # symmetric
        (3, 8, 16, 128, 256),     # asymmetric streams + odd batch
        (2, 10, 25, 128, 128),    # both seqs pad in-kernel
    ])
    def test_matches_reference(self, rng, b, sq, sk, hq, hkv):
        bi, heads = 128, 2
        xq, xkv, key_bias, ws, bs, gamma, beta = _mk(rng, b, sq, sk, hq, hkv, bi)
        args = [xq, xkv, key_bias] + _interleave(ws, bs)
        got = ck.fused_co_dir(*args, gamma, beta, num_heads=heads)
        want = ck.co_dir_reference(*args, gamma, beta, num_heads=heads)
        assert got.shape == (b, sq, hq)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_mask_isolation(self, rng):
        b, sq, sk, hq, hkv, bi, heads = 2, 8, 8, 128, 128, 128, 2
        xq, xkv, key_bias, ws, bs, gamma, beta = _mk(rng, b, sq, sk, hq, hkv, bi)
        args = lambda kv: [xq, kv, key_bias] + _interleave(ws, bs)  # noqa: E731
        base = ck.fused_co_dir(*args(xkv), gamma, beta, num_heads=heads)
        pert = ck.fused_co_dir(*args(xkv.at[:, -1, :].set(9.9)), gamma, beta,
                               num_heads=heads)
        np.testing.assert_allclose(np.asarray(base), np.asarray(pert),
                                   rtol=2e-5, atol=2e-5)

    def test_grad_flows_via_twin(self, rng):
        b, sq, sk, hq, hkv, bi, heads = 2, 8, 8, 128, 128, 128, 2
        xq, xkv, key_bias, ws, bs, gamma, beta = _mk(rng, b, sq, sk, hq, hkv, bi)

        def loss(xq_, w0):
            y = ck.fused_co_dir(xq_, xkv, key_bias, w0, bs[0], ws[1], bs[1],
                                ws[2], bs[2], ws[3], bs[3], gamma, beta,
                                num_heads=heads)
            return jnp.sum(y ** 2)

        g_x, g_w = jax.grad(loss, argnums=(0, 1))(xq, ws[0])
        assert np.isfinite(np.asarray(g_x)).all()
        assert np.abs(np.asarray(g_w)).max() > 0

    def test_int8_matches_int8_reference(self, rng):
        b, sq, sk, hq, hkv, bi, heads = 2, 8, 16, 128, 256, 128, 2
        xq, xkv, key_bias, ws, bs, gamma, beta = _mk(rng, b, sq, sk, hq, hkv, bi)
        args = [xq, xkv, key_bias]
        for w, bias in zip(ws, bs):
            q, sc = _quantize(w)
            args += [q, sc, bias]
        got = ck.fused_co_dir_int8(*args, gamma, beta, num_heads=heads)
        want = ck.co_dir_int8_reference(*args, gamma, beta, num_heads=heads)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


class TestModelWiring:
    @pytest.fixture()
    def model_pair(self, rng):
        import dataclasses

        from multimodal_classification_tpu.config import tiny_vilbert_config
        from multimodal_classification_tpu.models.vilbert import (
            ViLBERTForClassification,
            dummy_batch,
        )

        # ASYMMETRIC streams (v_hidden != hidden != bi) like the real FB
        # config — the probe path creates the output denses' params from the
        # probe input's last dim, and a symmetric config can't catch a probe
        # fed the wrong stream (that bug shipped once; see _try_fused_co_block)
        cfg = tiny_vilbert_config(
            dtype="float32", use_pallas_attention=False,
            hidden_size=128, v_hidden_size=256, bi_hidden_size=128,
            intermediate_size=256, v_intermediate_size=512,
            num_attention_heads=2, v_num_attention_heads=2,
            bi_num_attention_heads=2,
        )
        base = ViLBERTForClassification(cfg)
        fused = ViLBERTForClassification(
            dataclasses.replace(cfg, fused_co_attn=True))
        batch = dummy_batch(cfg, 3, 8, 8)
        batch["attention_mask"] = jnp.asarray(
            np.concatenate([np.ones((3, 6)), np.zeros((3, 2))], 1), jnp.float32)
        batch["visual_attention_mask"] = jnp.asarray(
            np.concatenate([np.ones((3, 7)), np.zeros((3, 1))], 1), jnp.float32)
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
        base, fused, params, batch = model_pair
        a = base.apply({"params": params}, **batch, deterministic=False,
                       rngs={"dropout": jax.random.key(9)})["logits"]
        b = fused.apply({"params": params}, **batch, deterministic=False,
                        rngs={"dropout": jax.random.key(9)})["logits"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    def test_auto_policy(self, model_pair, rng, monkeypatch):
        """Default "auto" policy (round-4 re-validation): int8 fuses at any
        batch WHEN fused_text_layer is on, only at batch >= 32 without it;
        float always falls back."""
        import dataclasses

        import multimodal_classification_tpu.ops.pallas_kernels as pk
        from multimodal_classification_tpu.models.vilbert import (
            ViLBERTForClassification,
            dummy_batch,
        )
        from multimodal_classification_tpu.ops.quant import build_quant_tree

        base, fused, params, batch = model_pair
        cfg = dataclasses.replace(base.cfg, fused_co_attn="auto",
                                  fused_text_layer=False)
        auto = ViLBERTForClassification(cfg)
        cfg_lyr = dataclasses.replace(cfg, fused_text_layer=True)
        auto_lyr = ViLBERTForClassification(cfg_lyr)
        calls = []
        for name in ("maybe_fused_co_dir", "maybe_fused_co_dir_int8"):
            orig = getattr(pk, name)
            monkeypatch.setattr(
                pk, name,
                lambda *a, _o=orig, _n=name, **k: calls.append(_n) or _o(*a, **k))
        quant = build_quant_tree(params, min_dim=64)

        # small batch (3), no text-layer fusion: auto refuses before probing
        auto.apply({"params": params, "quant": quant}, **batch,
                   deterministic=True)
        assert not calls
        # small batch WITH text-layer fusion + int8: fuses (the round-4
        # measured win: lyr8 3974 vs lyr8nc 3431 memes/s @16)
        auto_lyr.apply({"params": params, "quant": quant}, **batch,
                       deterministic=True)
        assert calls and set(calls) == {"maybe_fused_co_dir_int8"}
        calls.clear()
        # small batch with text-layer fusion but FLOAT: still refused
        auto_lyr.apply({"params": params}, **batch, deterministic=True)
        assert not calls
        big = dummy_batch(cfg, 32, 8, 8)
        # batch 32 float: auto still refuses (bf16 measured slower fused)
        auto.apply({"params": params}, **big, deterministic=True)
        assert not calls
        # batch 32 int8: the measured-win arm — kernels dispatch
        auto.apply({"params": params, "quant": quant}, **big,
                   deterministic=True)
        assert calls and set(calls) == {"maybe_fused_co_dir_int8"}

    def test_int8_quant_composes(self, model_pair):
        from multimodal_classification_tpu.ops.quant import build_quant_tree

        base, fused, params, batch = model_pair
        quant = build_quant_tree(params, min_dim=64)
        a = base.apply({"params": params, "quant": quant}, **batch,
                       deterministic=True)["logits"]
        b = fused.apply({"params": params, "quant": quant}, **batch,
                        deterministic=True)["logits"]
        assert (np.argmax(np.asarray(a), -1) == np.argmax(np.asarray(b), -1)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-2)
