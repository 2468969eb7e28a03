"""Flash-style tiled attention kernel parity vs XLA (interpret mode on CPU).

The kernel's value is sequences past the resident kernel's MAX_SEQ=512;
parity is checked at multi-block shapes (small blocks force real tiling so
the online-softmax accumulation, the two-pass backward, and the
counter-based dropout regeneration are all exercised across block
boundaries).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_classification_tpu.ops.attention import _attention_xla, mask_to_bias
from multimodal_classification_tpu.ops.pallas_kernels import flash_attention as fk


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        functools.partial(orig, interpret=jax.devices()[0].platform != "tpu"),
    )


def _mk(rng, b, h, sq, skv, d, dtype=np.float32):
    q = rng.standard_normal((b, h, sq, d)).astype(dtype)
    k = rng.standard_normal((b, h, skv, d)).astype(dtype)
    v = rng.standard_normal((b, h, skv, d)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


# small blocks → several grid steps even at test-sized sequences
FLASH = functools.partial(fk.flash_attention, block_q=32, block_kv=32)


class TestFlashAttention:
    @pytest.mark.parametrize("sq,skv,d", [(128, 128, 64), (96, 64, 32), (64, 128, 64)])
    def test_matches_xla_no_bias(self, rng, sq, skv, d):
        q, k, v = _mk(rng, 2, 2, sq, skv, d)
        got = FLASH(q, k, v, None)
        want = _attention_xla(q, k, v, None, 0.0, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_matches_xla_with_mask_and_ragged_seq(self, rng):
        # non-multiple-of-block lengths exercise the padding path
        q, k, v = _mk(rng, 2, 2, 70, 90, 64)
        mask = (rng.uniform(size=(2, 90)) > 0.3).astype(np.float32)
        bias = mask_to_bias(jnp.asarray(mask))
        got = FLASH(q, k, v, bias)
        want = _attention_xla(q, k, v, bias, 0.0, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_full_rank_bias(self, rng):
        q, k, v = _mk(rng, 2, 2, 64, 64, 32)
        bias = jnp.asarray(
            np.where(rng.uniform(size=(2, 2, 64, 64)) > 0.25, 0.0, -1e9).astype(np.float32)
        )
        got = FLASH(q, k, v, bias)
        want = _attention_xla(q, k, v, bias, 0.0, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_gradients_match_xla(self, rng):
        q, k, v = _mk(rng, 1, 2, 64, 96, 32)
        mask = (rng.uniform(size=(1, 96)) > 0.2).astype(np.float32)
        bias = mask_to_bias(jnp.asarray(mask))

        gf = jax.grad(lambda *a: jnp.sum(jnp.tanh(FLASH(*a, bias))),
                      argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda *a: jnp.sum(jnp.tanh(_attention_xla(*a, bias, 0.0, None))),
                      argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    def test_gradients_ragged(self, rng):
        q, k, v = _mk(rng, 1, 1, 40, 56, 32)
        gf = jax.grad(lambda *a: jnp.sum(FLASH(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda *a: jnp.sum(_attention_xla(*a, None, 0.0, None) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    def test_dropout_matches_hash_twin(self, rng):
        """In-kernel counter-based dropout is bit-exact with the XLA twin
        that regenerates the same hash stream."""
        q, k, v = _mk(rng, 1, 2, 64, 64, 32)
        key = jax.random.key(5)
        rate = 0.3
        seeds = fk._seeds_from_rng(key)

        got = FLASH(q, k, v, None, rate, key)
        want = fk.reference_attention(q, k, v, None, rate, seeds)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
        again = FLASH(q, k, v, None, rate, key)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(again))

    def test_dropout_tile_size_independent(self, rng):
        """Same mask regardless of block size (global-coordinate hash)."""
        q, k, v = _mk(rng, 1, 1, 64, 64, 32)
        key = jax.random.key(9)
        a = fk.flash_attention(q, k, v, None, 0.25, key, block_q=32, block_kv=32)
        b = fk.flash_attention(q, k, v, None, 0.25, key, block_q=64, block_kv=64)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)

    def test_dropout_gradients_match_hash_twin(self, rng):
        q, k, v = _mk(rng, 1, 2, 64, 64, 32)
        key = jax.random.key(3)
        rate = 0.2
        seeds = fk._seeds_from_rng(key)

        gf = jax.grad(lambda *a: jnp.sum(FLASH(*a, None, rate, key) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(
            lambda *a: jnp.sum(fk.reference_attention(*a, None, rate, seeds) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    def test_dropout_grads_with_bias_and_ragged(self, rng):
        q, k, v = _mk(rng, 1, 1, 40, 48, 32)
        mask = (rng.uniform(size=(1, 48)) > 0.2).astype(np.float32)
        bias = mask_to_bias(jnp.asarray(mask))
        key = jax.random.key(17)
        rate = 0.1
        seeds = fk._seeds_from_rng(key)

        gf = jax.grad(lambda *a: jnp.sum(FLASH(*a, bias, rate, key) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(
            lambda *a: jnp.sum(fk.reference_attention(*a, bias, rate, seeds) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    def test_bfloat16_io(self, rng):
        q, k, v = _mk(rng, 1, 2, 64, 64, 64)
        qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
        got = FLASH(qb, kb, vb, None)
        assert got.dtype == jnp.bfloat16
        want = _attention_xla(q, k, v, None, 0.0, None)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
        )

    def test_supports_and_dispatch(self, rng, monkeypatch):
        from multimodal_classification_tpu.ops import pallas_kernels
        from multimodal_classification_tpu.ops.pallas_kernels import attention as pk

        q, k, v = _mk(rng, 1, 1, 1024, 1024, 64)
        assert not pk.supports(q, k, v, None)       # resident kernel ceiling
        assert fk.supports(q, k, v, None)           # flash takes over
        big = jnp.zeros((1, 1, fk.MAX_SEQ + 1, 64))
        assert not fk.supports(big, big, big, None)

        monkeypatch.setattr(pallas_kernels, "on_tpu", lambda: True)
        fn = pallas_kernels.maybe_fused_attention(q, k, v, None, 0.0, None)
        assert fn is not None
