"""Training fused-FFN-block kernel: fwd/bwd parity vs its exact-bit XLA twin,
plus model-level wiring of ``config.fused_ffn_training``.

On the CPU test backend the kernels run in interpreter mode (same code path
as Mosaic modulo compilation); bench/TPU runs exercise the compiled kernels.
The twin (``ffn_block_reference``) regenerates the kernel's counter-hash
dropout bits exactly, so parity holds with dropout ON — the property that
makes the fused training path testable at all.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_classification_tpu.ops.pallas_kernels import (
    fused_ffn_train as fk,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    import multimodal_classification_tpu.ops.pallas_kernels as pk

    on_cpu = jax.devices()[0].platform != "tpu"
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=on_cpu))
    monkeypatch.setattr(pk, "on_tpu", lambda: True)


def _mk(rng, rows, h, i, dtype=np.float32):
    x = jnp.asarray(rng.standard_normal((rows, h)).astype(dtype))
    w1 = jnp.asarray(rng.standard_normal((h, i)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal((i,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((i, h)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal((h,)).astype(np.float32) * 0.1)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal((h,)).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal((h,)).astype(np.float32))
    return x, w1, b1, w2, b2, gamma, beta


def _seeds(key):
    return jax.random.bits(key, (2,), jnp.uint32)


class TestForward:
    @pytest.mark.parametrize("rows,h,i", [(128, 128, 256), (96, 256, 128), (7, 128, 128)])
    def test_matches_twin_no_dropout(self, rng, rows, h, i):
        args = _mk(rng, rows, h, i)
        got = fk.fused_ffn_block_train(*args, dropout_rate=0.0)
        want = fk.ffn_block_reference(*args, 0.0, jnp.zeros((2,), jnp.uint32))
        assert got.shape == (rows, h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_twin_with_dropout_exact_bits(self, rng):
        args = _mk(rng, 64, 128, 256)
        key = jax.random.PRNGKey(7)
        got = fk.fused_ffn_block_train(*args, dropout_rate=0.3, dropout_rng=key)
        want = fk.ffn_block_reference(*args, 0.3, _seeds(key))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        # dropout actually dropped something: fused != no-dropout forward
        base = fk.ffn_block_reference(*args, 0.0, _seeds(key))
        assert np.abs(np.asarray(got) - np.asarray(base)).max() > 1e-3

    def test_batched_leading_dims(self, rng):
        x, *rest = _mk(rng, 6 * 16, 128, 256)
        x3 = x.reshape(6, 16, 128)
        got = fk.fused_ffn_block_train(x3, *rest, dropout_rate=0.0)
        want = fk.ffn_block_reference(x, *rest, 0.0,
                                      jnp.zeros((2,), jnp.uint32)).reshape(6, 16, 128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_bf16(self, rng):
        x, *rest = _mk(rng, 64, 128, 256)
        xb = x.astype(jnp.bfloat16)
        got = fk.fused_ffn_block_train(xb, *rest, dropout_rate=0.0)
        want = fk.ffn_block_reference(xb, *rest, 0.0, jnp.zeros((2,), jnp.uint32))
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-2, atol=2e-2)


class TestBackward:
    @pytest.mark.parametrize("rate", [0.0, 0.25])
    def test_grads_match_twin(self, rng, rate):
        args = _mk(rng, 32, 128, 128)
        key = jax.random.PRNGKey(3)
        seeds = _seeds(key)

        def loss_k(*a):
            return jnp.sum(
                fk.fused_ffn_block_train(*a, dropout_rate=rate, dropout_rng=key) ** 2
            )

        def loss_r(*a):
            return jnp.sum(fk.ffn_block_reference(*a, rate, seeds) ** 2)

        gk = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
        gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
        names = ["x", "w1", "b1", "w2", "b2", "gamma", "beta"]
        for name, a, b in zip(names, gk, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
                err_msg=f"grad({name}) mismatch at rate={rate}",
            )

    def test_grads_padded_rows(self, rng):
        # row count not a block multiple: padded-row contributions must vanish
        args = _mk(rng, 23, 128, 128)

        def loss_k(*a):
            return jnp.sum(fk.fused_ffn_block_train(*a, dropout_rate=0.0) ** 2)

        def loss_r(*a):
            return jnp.sum(
                fk.ffn_block_reference(*a, 0.0, jnp.zeros((2,), jnp.uint32)) ** 2
            )

        gk = jax.grad(loss_k, argnums=(0, 1, 4))(*args)
        gr = jax.grad(loss_r, argnums=(0, 1, 4))(*args)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)

    def test_supported_gates(self):
        assert fk.supported_train(768, 3072, jnp.bfloat16)   # text FFN
        assert not fk.supported_train(1024, 4096, jnp.bfloat16)  # visual: VMEM
        assert not fk.supported_train(768, 3000, jnp.bfloat16)   # misaligned


class TestModelWiring:
    def _model_and_batch(self, train_fused):
        from multimodal_classification_tpu.config import tiny_vilbert_config
        from multimodal_classification_tpu.models.vilbert import (
            ViLBERTForClassification,
            dummy_batch,
        )

        cfg = tiny_vilbert_config(
            hidden_size=128, intermediate_size=256, v_hidden_size=128,
            v_intermediate_size=128, bi_hidden_size=128, dtype="float32",
            fused_ffn_training=train_fused,
        )
        model = ViLBERTForClassification(cfg)
        batch = dummy_batch(cfg, batch_size=2, seq_len=16, num_regions=8)
        return model, batch

    def test_param_tree_unchanged_and_train_dispatches(self, monkeypatch):
        import multimodal_classification_tpu.ops.pallas_kernels as pk

        calls = []
        orig = pk.maybe_fused_ffn_train

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(pk, "maybe_fused_ffn_train", spy)
        import multimodal_classification_tpu.models.layers as layers_mod
        monkeypatch.setattr(layers_mod, "apply_ffn",
                            layers_mod.apply_ffn)  # no-op, keeps import fresh

        model_t, batch = self._model_and_batch(True)
        model_u, _ = self._model_and_batch(False)
        params_u = model_u.init({"params": jax.random.PRNGKey(0)}, **batch,
                                deterministic=True)["params"]
        params_t = model_t.init({"params": jax.random.PRNGKey(0)}, **batch,
                                deterministic=True)["params"]
        assert (jax.tree_util.tree_structure(params_u)
                == jax.tree_util.tree_structure(params_t))

        # eval applies never dispatch the training kernel
        model_t.apply({"params": params_t}, **batch, deterministic=True)
        assert not calls

        out = model_t.apply(
            {"params": params_t}, **batch, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert calls, "training apply did not reach the fused-train dispatch"
        assert np.all(np.isfinite(np.asarray(out["logits"])))

    def test_grads_flow_through_fused_path(self):
        model_t, batch = self._model_and_batch(True)
        model_u, _ = self._model_and_batch(False)
        params = model_u.init({"params": jax.random.PRNGKey(0)}, **batch,
                              deterministic=True)["params"]
        labels = jnp.array([0, 1])

        def loss(m):
            def f(p):
                out = m.apply({"params": p}, **batch, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(2)})
                logits = out["logits"]
                return -jnp.mean(
                    jax.nn.log_softmax(logits)[jnp.arange(2), labels]
                )
            return f

        g_t = jax.grad(loss(model_t))(params)
        g_u = jax.grad(loss(model_u))(params)
        # same tree structure, every FFN weight gets a nonzero gradient
        assert (jax.tree_util.tree_structure(g_t)
                == jax.tree_util.tree_structure(g_u))
        flat = jax.tree_util.tree_leaves_with_path(g_t)
        ffn_leaves = [
            (path, leaf) for path, leaf in flat
            if "intermediate" in jax.tree_util.keystr(path)
        ]
        assert ffn_leaves
        for path, leaf in ffn_leaves:
            assert np.abs(np.asarray(leaf)).max() > 0, jax.tree_util.keystr(path)


class TestStrategies:
    """Both layout strategies must agree with the twin: the I-grid (cols)
    path covers small-row training shapes; the row-grid path covers large
    row counts. Shrinking the VMEM budget forces multi-chunk / small-block
    layouts so the grid-carried accumulators and @pl.when writes are
    exercised with more than one grid step."""

    def test_cols_multichunk_forward_and_grads(self, rng, monkeypatch):
        monkeypatch.setattr(fk, "_VMEM_BUDGET", 400 * 1024)
        ic_f = fk._chunk_cols_fwd(32, 128, 256, 4)
        ic_b = fk._chunk_cols_bwd(32, 128, 256, 4)
        assert 0 < ic_f < 256 and 0 < ic_b < 256  # really multi-chunk
        args = _mk(rng, 30, 128, 256)
        key = jax.random.PRNGKey(9)
        seeds = _seeds(key)
        got = fk.fused_ffn_block_train(*args, dropout_rate=0.3, dropout_rng=key)
        want = fk.ffn_block_reference(*args, 0.3, seeds)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-5)

        def loss_k(*a):
            return jnp.sum(
                fk.fused_ffn_block_train(*a, dropout_rate=0.3, dropout_rng=key) ** 2)

        def loss_r(*a):
            return jnp.sum(fk.ffn_block_reference(*a, 0.3, seeds) ** 2)

        gk = jax.grad(loss_k, argnums=(0, 1, 3, 5))(*args)
        gr = jax.grad(loss_r, argnums=(0, 1, 3, 5))(*args)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)

    def test_rows_path_above_threshold(self, rng, monkeypatch):
        # more rows than _COLS_MAX_ROWS → the row-grid strategy runs
        monkeypatch.setattr(fk, "_COLS_MAX_ROWS", 64)
        args = _mk(rng, 96, 128, 128)
        got = fk.fused_ffn_block_train(*args, dropout_rate=0.0)
        want = fk.ffn_block_reference(*args, 0.0, jnp.zeros((2,), jnp.uint32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

        def loss_k(*a):
            return jnp.sum(fk.fused_ffn_block_train(*a, dropout_rate=0.0) ** 2)

        def loss_r(*a):
            return jnp.sum(
                fk.ffn_block_reference(*a, 0.0, jnp.zeros((2,), jnp.uint32)) ** 2)

        gk = jax.grad(loss_k, argnums=(0, 1))(*args)
        gr = jax.grad(loss_r, argnums=(0, 1))(*args)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)

    def test_flagship_shapes_take_cols(self):
        # batch16 x 32 tokens = 512 rows, text FFN 768/3072 bf16
        assert fk._chunk_cols_fwd(512, 768, 3072, 2) > 0
        assert fk._chunk_cols_bwd(512, 768, 3072, 2) > 0
        assert fk.supported_train(768, 3072, jnp.bfloat16, rows=512)
