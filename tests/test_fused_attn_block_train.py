"""Training fused attention-block kernel: fwd/bwd parity vs its exact-bit
XLA twin, plus model-level wiring of ``config.fused_attn_block_training``.

Same test discipline as test_fused_ffn_train.py: CPU runs the kernels in
interpreter mode; the twin regenerates the kernels' counter-hash dropout
bits exactly, so parity holds with both dropouts ON.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_classification_tpu.ops.pallas_kernels import (
    fused_attn_block_train as fk,
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
    x3 = jnp.asarray(rng.standard_normal((b, s, h)).astype(dtype))
    key_bias = jnp.zeros((b, s), jnp.float32)
    ws = [jnp.asarray(rng.standard_normal((h, h)).astype(np.float32) * 0.05)
          for _ in range(4)]
    bs = [jnp.asarray(rng.standard_normal((h,)).astype(np.float32) * 0.1)
          for _ in range(4)]
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal((h,)).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal((h,)).astype(np.float32))
    wq, wk, wv, wo = ws
    bq, bk, bv, bo = bs
    return x3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta


def _seeds(key):
    return jax.random.bits(key, (4,), jnp.uint32)


class TestForward:
    @pytest.mark.parametrize("b,s,h,heads", [(4, 16, 128, 2), (3, 13, 256, 2)])
    def test_matches_twin_no_dropout(self, rng, b, s, h, heads):
        args = _mk(rng, b, s, h)
        got = fk.fused_attn_block_train(*args, heads, 0.0, 0.0)
        want = fk.block_train_reference(*args, heads, 0.0, 0.0,
                                        jnp.zeros((4,), jnp.uint32))
        assert got.shape == (b, s, h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_twin_with_dropouts_exact_bits(self, rng):
        args = _mk(rng, 4, 16, 128)
        key = jax.random.PRNGKey(11)
        got = fk.fused_attn_block_train(*args, 2, 0.2, 0.3, dropout_rng=key)
        want = fk.block_train_reference(*args, 2, 0.2, 0.3, _seeds(key))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-5)
        base = fk.block_train_reference(*args, 2, 0.0, 0.0, _seeds(key))
        assert np.abs(np.asarray(got) - np.asarray(base)).max() > 1e-3

    def test_masked_keys_ignored(self, rng):
        # real rows must not attend to masked key positions
        x3, _, *rest = _mk(rng, 2, 12, 128)
        kb = jnp.zeros((2, 12), jnp.float32).at[:, 8:].set(fk.NEG_INF)
        x3_trunc = x3[:, :8]
        got_mask = fk.fused_attn_block_train(x3, kb, *rest, 2, 0.0, 0.0)
        got_trunc = fk.fused_attn_block_train(
            x3_trunc, jnp.zeros((2, 8), jnp.float32), *rest, 2, 0.0, 0.0)
        np.testing.assert_allclose(np.asarray(got_mask[:, :8]),
                                   np.asarray(got_trunc), rtol=2e-5, atol=2e-5)

    def test_bf16(self, rng):
        x3, *rest = _mk(rng, 4, 16, 128)
        got = fk.fused_attn_block_train(x3.astype(jnp.bfloat16), *rest, 2, 0.0, 0.0)
        want = fk.block_train_reference(x3.astype(jnp.bfloat16), *rest, 2,
                                        0.0, 0.0, jnp.zeros((4,), jnp.uint32))
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=3e-2, atol=3e-2)


class TestBackward:
    @pytest.mark.parametrize("rates", [(0.0, 0.0), (0.2, 0.25)])
    def test_grads_match_twin(self, rng, rates):
        ra, rh = rates
        args = _mk(rng, 3, 13, 128)
        key = jax.random.PRNGKey(5)
        seeds = _seeds(key)
        heads = 2
        diff_idx = (0,) + tuple(range(2, 12))  # x + weights/biases/LN (not key_bias)

        def loss_k(*a):
            return jnp.sum(
                fk.fused_attn_block_train(*a, heads, ra, rh, dropout_rng=key) ** 2
            )

        def loss_r(*a):
            return jnp.sum(fk.block_train_reference(*a, heads, ra, rh, seeds) ** 2)

        gk = jax.grad(loss_k, argnums=diff_idx)(*args)
        gr = jax.grad(loss_r, argnums=diff_idx)(*args)
        names = ["x", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
                 "gamma", "beta"]
        for name, a, b in zip(names, gk, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3,
                err_msg=f"grad({name}) mismatch at rates={rates}",
            )

    def test_supported_gates(self, monkeypatch):
        assert fk.supported_train(16, 32, 768, 12, jnp.bfloat16)   # text layer
        # visual 1024-d: single-pass bwd exceeds VMEM; the two-pass split
        # backward carries it but measured SLOWER end-to-end (22.4 vs
        # 21.5 ms/step) → opt-in via MMC_ATTN_TRAIN_SPLIT, default refused
        assert not fk.supported_train(16, 112, 1024, 8, jnp.bfloat16)
        monkeypatch.setenv("MMC_ATTN_TRAIN_SPLIT", "1")
        assert fk.supported_train(16, 112, 1024, 8, jnp.bfloat16)
        assert fk._pick_layout_train(112, 1024, 2)[2] is True
        # text keeps its measured single-pass layout either way
        assert fk._pick_layout_train(32, 768, 2)[2] is False
        assert not fk.supported_train(16, 32, 700, 10, jnp.bfloat16)   # misaligned


class TestSplitBackward:
    """The two-pass backward (pass A: LN+out, pass B: attention VJP) must be
    bit-identical to the single-pass kernel — they run the same op/dtype
    sequence stitched by f32 dz/dctx exports."""

    @pytest.mark.parametrize("rates", [(0.0, 0.0), (0.2, 0.25)])
    def test_split_equals_single_pass(self, rng, rates):
        ra, rh = rates
        b, s, h, heads = 4, 16, 128, 2
        args = _mk(rng, b, s, h)
        x3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta = args
        key = jax.random.PRNGKey(7)
        seeds = _seeds(key) if (ra or rh) else jnp.zeros((4,), jnp.uint32)
        s_p, bb, split = fk._pick_layout_train(s, h, 4)
        assert not split
        x2 = x3.reshape(b * s, h)
        bias_rep = jnp.broadcast_to(
            key_bias.reshape(1, b * s), (8, b * s)).astype(jnp.float32)
        _, z = fk._run_fwd(heads, s_p, bb, ra, rh, x2, bias_rep,
                           wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta, seeds)
        dy = jnp.asarray(
            np.random.default_rng(3).standard_normal((b * s, h)),
            jnp.float32)
        single = fk._run_bwd(heads, s_p, bb, ra, rh, x2, z, dy, bias_rep,
                             wq, bq, wk, bk, wv, bv, wo, gamma, seeds)
        two = fk._run_bwd_split(heads, s_p, bb, ra, rh, x2, z, dy, bias_rep,
                                wq, bq, wk, bk, wv, bv, wo, gamma, seeds)
        for name, a, b_ in zip(("dx", "dq", "dk", "dv", "dd", "ctx"),
                               single, two):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b_),
                err_msg=f"{name} differs between split and single-pass")

    def test_grads_match_twin_with_split_forced(self, rng, monkeypatch):
        ra, rh = 0.2, 0.25
        args = _mk(rng, 3, 13, 128)
        key = jax.random.PRNGKey(5)
        seeds = _seeds(key)
        heads = 2
        orig = fk._pick_layout_train
        monkeypatch.setattr(
            fk, "_pick_layout_train",
            lambda *a: (orig(*a)[0], orig(*a)[1], True))
        diff_idx = (0,) + tuple(range(2, 12))

        def loss_k(*a):
            return jnp.sum(
                fk.fused_attn_block_train(*a, heads, ra, rh, dropout_rng=key) ** 2
            )

        def loss_r(*a):
            return jnp.sum(fk.block_train_reference(*a, heads, ra, rh, seeds) ** 2)

        gk = jax.grad(loss_k, argnums=diff_idx)(*args)
        gr = jax.grad(loss_r, argnums=diff_idx)(*args)
        for name, a, b in zip(
            ["x", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
             "gamma", "beta"], gk, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3,
                err_msg=f"grad({name}) mismatch on the split backward")


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
            fused_attn_block_training=train_fused,
        )
        model = ViLBERTForClassification(cfg)
        batch = dummy_batch(cfg, batch_size=2, seq_len=16, num_regions=8)
        return model, batch

    def test_dispatch_and_grads(self, monkeypatch):
        import multimodal_classification_tpu.ops.pallas_kernels as pk

        calls = []
        orig = pk.maybe_fused_attn_block_train

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(pk, "maybe_fused_attn_block_train", spy)
        model_t, batch = self._model_and_batch(True)
        params = model_t.init({"params": jax.random.PRNGKey(0)}, **batch,
                              deterministic=True)["params"]
        model_t.apply({"params": params}, **batch, deterministic=True)
        assert not calls  # eval never reaches the training dispatch

        labels = jnp.array([0, 1])

        def f(p):
            out = model_t.apply({"params": p}, **batch, deterministic=False,
                                rngs={"dropout": jax.random.PRNGKey(2)})
            return -jnp.mean(
                jax.nn.log_softmax(out["logits"])[jnp.arange(2), labels])

        g = jax.grad(f)(params)
        assert calls, "training apply did not reach the fused-train dispatch"
        leaves = jax.tree_util.tree_leaves_with_path(g)
        attn_w = [(path, leaf) for path, leaf in leaves
                  if "attention" in jax.tree_util.keystr(path)
                  and "kernel" in jax.tree_util.keystr(path)]
        assert attn_w
        for path, leaf in attn_w:
            assert np.abs(np.asarray(leaf)).max() > 0, jax.tree_util.keystr(path)

    def test_param_tree_unchanged(self):
        model_t, batch = self._model_and_batch(True)
        model_u, _ = self._model_and_batch(False)
        pt = model_t.init({"params": jax.random.PRNGKey(0)}, **batch,
                          deterministic=True)["params"]
        pu = model_u.init({"params": jax.random.PRNGKey(0)}, **batch,
                          deterministic=True)["params"]
        assert (jax.tree_util.tree_structure(pt)
                == jax.tree_util.tree_structure(pu))
