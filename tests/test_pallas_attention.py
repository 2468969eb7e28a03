"""Pallas fused-attention kernel parity vs the XLA reference implementation.

On the CPU test backend the kernel runs in interpreter mode (same code path
as Mosaic modulo compilation); bench/TPU runs exercise the compiled kernel.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_classification_tpu.ops.attention import _attention_xla, mask_to_bias
from multimodal_classification_tpu.ops.pallas_kernels import attention as pk


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    """Force interpret mode for pallas_call on CPU."""
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(orig, interpret=jax.devices()[0].platform != "tpu")
    )


def _mk(rng, b, h, sq, skv, d, dtype=np.float32):
    q = rng.standard_normal((b, h, sq, d)).astype(dtype)
    k = rng.standard_normal((b, h, skv, d)).astype(dtype)
    v = rng.standard_normal((b, h, skv, d)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


class TestFusedAttention:
    @pytest.mark.parametrize("sq,skv,d", [(128, 128, 64), (128, 100, 128), (100, 128, 64), (12, 10, 32)])
    def test_matches_xla_no_bias(self, rng, sq, skv, d):
        q, k, v = _mk(rng, 2, 3, sq, skv, d)
        got = pk.fused_attention(q, k, v, None)
        want = _attention_xla(q, k, v, None, 0.0, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("sq,skv,d", [(16, 100, 64), (128, 100, 128)])
    def test_matches_xla_with_mask_bias(self, rng, sq, skv, d):
        q, k, v = _mk(rng, 2, 2, sq, skv, d)
        mask = (rng.uniform(size=(2, skv)) > 0.3).astype(np.float32)
        bias = mask_to_bias(jnp.asarray(mask))
        got = pk.fused_attention(q, k, v, bias)
        want = _attention_xla(q, k, v, bias, 0.0, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_supports_rejects_bad_shapes(self, rng):
        q, k, v = _mk(rng, 1, 1, 8, 8, 16)
        assert pk.supports(q, k, v, None)
        assert not pk.supports(q[0], k, v, None)
        assert not pk.supports(q, k, v, jnp.zeros((1, 1, 1, 99)))
        big = jnp.zeros((1, 1, 4096, 16))
        assert not pk.supports(big, big, big, None)

    def test_gradients_flow_through_custom_vjp(self, rng):
        q, k, v = _mk(rng, 1, 2, 16, 12, 32)
        mask = (rng.uniform(size=(1, 12)) > 0.2).astype(np.float32)
        bias = mask_to_bias(jnp.asarray(mask))

        def loss_fused(q, k, v):
            return jnp.sum(pk.fused_attention(q, k, v, bias) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(_attention_xla(q, k, v, bias, 0.0, None) ** 2)

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    def test_fused_bi_attention_matches_xla(self, rng):
        from multimodal_classification_tpu.ops.pallas_kernels import bi_attention as bk

        b, h, s1, s2, d = 2, 2, 100, 128, 64
        q1, k1, v1 = _mk(rng, b, h, s1, s1, d)
        q2, k2, v2 = _mk(rng, b, h, s2, s2, d)
        m1 = (rng.uniform(size=(b, s2)) > 0.2).astype(np.float32)
        m2 = (rng.uniform(size=(b, s1)) > 0.2).astype(np.float32)
        bias1 = mask_to_bias(jnp.asarray(m1))
        bias2 = mask_to_bias(jnp.asarray(m2))
        got1, got2 = bk.fused_bi_attention(q1, k2, v2, q2, k1, v1, bias1, bias2)
        want1 = _attention_xla(q1, k2, v2, bias1, 0.0, None)
        want2 = _attention_xla(q2, k1, v1, bias2, 0.0, None)
        np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=2e-5, atol=2e-5)

    def test_fused_bi_attention_gradients(self, rng):
        from multimodal_classification_tpu.ops.pallas_kernels import bi_attention as bk

        b, h, s1, s2, d = 1, 2, 10, 12, 32
        q1, k1, v1 = _mk(rng, b, h, s1, s1, d)
        q2, k2, v2 = _mk(rng, b, h, s2, s2, d)

        def loss_fused(q1, k2, v2):
            c1, c2 = bk.fused_bi_attention(q1, k2, v2, q2, k1, v1, None, None)
            return jnp.sum(c1 ** 2) + jnp.sum(c2 ** 2)

        def loss_ref(q1, k2, v2):
            c1 = _attention_xla(q1, k2, v2, None, 0.0, None)
            c2 = _attention_xla(q2, k1, v1, None, 0.0, None)
            return jnp.sum(c1 ** 2) + jnp.sum(c2 ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q1, k2, v2)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q1, k2, v2)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)

    def test_fused_backward_matches_xla_with_mask(self, rng):
        """The fused backward *kernel* (not an XLA recompute) produces the
        same gradients as the reference chain, masks included."""
        q, k, v = _mk(rng, 2, 2, 100, 128, 64)
        mask = (rng.uniform(size=(2, 128)) > 0.3).astype(np.float32)
        bias = mask_to_bias(jnp.asarray(mask))

        gf = jax.grad(lambda *a: jnp.sum(jnp.tanh(pk.fused_attention(*a, bias))),
                      argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda *a: jnp.sum(jnp.tanh(_attention_xla(*a, bias, 0.0, None))),
                      argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    def test_dropout_forward_matches_bit_twin(self, rng):
        """In-kernel dropout is bit-exact with the canonical XLA twin
        (same jax.random.bits stream, same threshold rule)."""
        q, k, v = _mk(rng, 1, 2, 24, 20, 32)
        mask = (rng.uniform(size=(1, 20)) > 0.2).astype(np.float32)
        bias = mask_to_bias(jnp.asarray(mask))
        key = jax.random.key(7)
        rate = 0.3

        got = pk.fused_attention(q, k, v, bias, rate, key)

        bits = pk.dropout_bits(key, (1, 2, 24, 20))
        keep = bits >= jnp.uint32(pk.keep_threshold(rate))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(32) + bias
        probs = jax.nn.softmax(scores, -1)
        probs = jnp.where(keep, probs / (1 - rate), 0.0)
        want = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        # deterministic: same key → same output
        again = pk.fused_attention(q, k, v, bias, rate, key)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(again))

    def test_dropout_gradients_match_bit_twin(self, rng):
        q, k, v = _mk(rng, 1, 2, 16, 12, 32)
        key = jax.random.key(3)
        rate = 0.2
        bits = pk.dropout_bits(key, (1, 2, 16, 12))
        keep = bits >= jnp.uint32(pk.keep_threshold(rate))

        def loss_fused(q, k, v):
            return jnp.sum(pk.fused_attention(q, k, v, None, rate, key) ** 2)

        def loss_ref(q, k, v):
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(32)
            probs = jax.nn.softmax(scores, -1)
            probs = jnp.where(keep, probs / (1 - rate), 0.0)
            return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", probs, v) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_bi_attention_dropout_forward_and_grads(self, rng):
        from multimodal_classification_tpu.ops.pallas_kernels import bi_attention as bk

        b, h, s1, s2, d = 1, 2, 12, 16, 32
        q1, k1, v1 = _mk(rng, b, h, s1, s1, d)
        q2, k2, v2 = _mk(rng, b, h, s2, s2, d)
        keys = (jax.random.key(11), jax.random.key(12))
        rate = 0.25
        keep1 = pk.dropout_bits(keys[0], (b, h, s1, s2)) >= jnp.uint32(pk.keep_threshold(rate))
        keep2 = pk.dropout_bits(keys[1], (b, h, s2, s1)) >= jnp.uint32(pk.keep_threshold(rate))

        def ref_one(q, k, v, keep):
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
            probs = jax.nn.softmax(scores, -1)
            probs = jnp.where(keep, probs / (1 - rate), 0.0)
            return jnp.einsum("bhqk,bhkd->bhqd", probs, v)

        got1, got2 = bk.fused_bi_attention(q1, k2, v2, q2, k1, v1, None, None,
                                           rate, keys)
        np.testing.assert_allclose(np.asarray(got1),
                                   np.asarray(ref_one(q1, k2, v2, keep1)),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got2),
                                   np.asarray(ref_one(q2, k1, v1, keep2)),
                                   rtol=2e-5, atol=2e-5)

        def loss_fused(q1, k2, v2):
            c1, c2 = bk.fused_bi_attention(q1, k2, v2, q2, k1, v1, None, None,
                                           rate, keys)
            return jnp.sum(c1 ** 2) + jnp.sum(c2 ** 2)

        def loss_ref(q1, k2, v2):
            return (jnp.sum(ref_one(q1, k2, v2, keep1) ** 2)
                    + jnp.sum(ref_one(q2, k1, v1, keep2) ** 2))

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q1, k2, v2)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q1, k2, v2)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-4)

    def test_training_dispatches_pallas(self, rng, monkeypatch):
        """With dropout > 0 and a TPU-like backend, attention_core dispatches
        the fused kernel for BOTH forward and backward (the VJP jaxpr contains
        two pallas_calls and no XLA softmax fallback)."""
        from multimodal_classification_tpu.ops import pallas_kernels
        from multimodal_classification_tpu.ops.attention import attention_core

        monkeypatch.setattr(pallas_kernels, "on_tpu", lambda: True)
        q, k, v = _mk(rng, 1, 2, 16, 12, 32)
        key = jax.random.key(0)

        def loss(q, k, v):
            return jnp.sum(
                attention_core(q, k, v, None, dropout_rate=0.1,
                               dropout_rng=key, impl="auto") ** 2
            )

        fwd_jaxpr = str(jax.make_jaxpr(loss)(q, k, v))
        assert "pallas_call" in fwd_jaxpr
        grad_jaxpr = str(jax.make_jaxpr(jax.grad(loss))(q, k, v))
        assert grad_jaxpr.count("pallas_call") >= 2  # fused fwd + fused bwd

    def test_bfloat16_io(self, rng):
        q, k, v = _mk(rng, 1, 2, 32, 24, 64)
        qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
        got = pk.fused_attention(qb, kb, vb, None)
        assert got.dtype == jnp.bfloat16
        want = _attention_xla(q, k, v, None, 0.0, None)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
        )
