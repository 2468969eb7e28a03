"""Flat-slab params/optimizer exactness (training/flat_slab.py).

The slab path must compute the SAME training trajectory as the per-leaf
path: Adam/decay/LR are elementwise (bit-identical per element); only the
global-norm clip's reduction order differs, so multi-step comparisons use a
tight allclose rather than bit equality.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodal_classification_tpu.config import tiny_vilbert_config
from multimodal_classification_tpu.data.device_cache import (
    build_device_data,
    make_device_eval_step,
    make_device_multi_step,
    make_device_train_step,
)
from multimodal_classification_tpu.models.vilbert import ViLBERTForClassification
from multimodal_classification_tpu.training.flat_slab import (
    Slabbed,
    make_unpack,
    plan_slabs,
    slab_pack,
    slab_state_to_tree,
    slab_unpack,
    tree_state_to_slab,
)
from multimodal_classification_tpu.training.losses import get_loss_function
from multimodal_classification_tpu.training.optimizers import adamw_mixed
from multimodal_classification_tpu.training.train import TrainState, model_inputs
from tests.test_device_cache import _dataset


def _tree_allclose(a, b, rtol=1e-6, atol=1e-7):
    flat_a, tree_a = jax.tree.flatten(a)
    flat_b, tree_b = jax.tree.flatten(b)
    assert tree_a == tree_b
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            rtol=rtol, atol=atol)


def _example_tree():
    rng = np.random.default_rng(0)
    return {
        "a": {"kernel": jnp.asarray(rng.standard_normal((64, 64)), jnp.float32),
              "bias": jnp.asarray(rng.standard_normal(64), jnp.float32)},
        "b": {"scale": jnp.asarray(rng.standard_normal(32), jnp.float32),
              "w": jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)},
    }


class TestPackUnpack:
    def test_round_trip_bit_exact(self):
        tree = _example_tree()
        spec = plan_slabs(tree, threshold_bytes=1024)
        back = slab_unpack(slab_pack(tree, spec), spec)
        for x, y in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_all_mode_slabs_everything(self):
        tree = _example_tree()
        spec = plan_slabs(tree, threshold_bytes=-1)
        assert len(spec.large_positions) == 0
        assert len(spec.small) == 4
        slab = slab_pack(tree, spec)
        total = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))
        assert slab.packs["float32"].shape == (total,)
        back = slab_unpack(slab, spec)
        for x, y in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_unpack_vjp_is_concat(self):
        """Grad through the custom-vjp view == grad w.r.t. the plain tree,
        repacked (the slices partition the slab)."""
        tree = _example_tree()
        spec = plan_slabs(tree, threshold_bytes=1024)
        unpack = make_unpack(spec)

        def loss_slab(slab):
            t = unpack(slab)
            return sum(jnp.sum(x * x) * (i + 1)
                       for i, x in enumerate(jax.tree.leaves(t)))

        def loss_tree(t):
            return sum(jnp.sum(x * x) * (i + 1)
                       for i, x in enumerate(jax.tree.leaves(t)))

        g_slab = jax.grad(loss_slab)(slab_pack(tree, spec))
        g_tree = jax.grad(loss_tree)(tree)
        expect = slab_pack(g_tree, spec)
        _tree_allclose(g_slab, expect, rtol=0, atol=0)

    def test_moment_tree_packs_under_plan_dtype_key(self):
        """A bf16 moments tree planned from f32 params packs correctly
        (offsets are element counts, key is the plan's bucket name)."""
        tree = _example_tree()
        spec = plan_slabs(tree, threshold_bytes=1024)
        mu = jax.tree.map(lambda p: p.astype(jnp.bfloat16), tree)
        slab = slab_pack(mu, spec)
        assert slab.packs["float32"].dtype == jnp.bfloat16
        back = slab_unpack(slab, spec)
        for x, y in zip(jax.tree.leaves(mu), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(x, np.float32),
                                          np.asarray(y, np.float32))


def _tiny_setup(n=24):
    cfg = tiny_vilbert_config(dtype="float32", use_pallas_attention=False,
                              v_feature_size=32)
    model = ViLBERTForClassification(cfg)
    ds = _dataset(n)
    data = build_device_data(ds, feature_dtype=jnp.float32)
    loss_fn = get_loss_function("ce")
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        adamw_mixed(1e-3, eps=1e-8, weight_decay=0.01,
                    mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16),
    )
    batch0 = {k: np.stack([ds.get(i)[k] for i in range(4)]) for k in ds.get(0)}
    params = model.init(jax.random.key(0), **model_inputs(batch0))["params"]
    return model, data, loss_fn, tx, params


@pytest.mark.parametrize("threshold", [65536, -1])
def test_train_trajectory_matches_per_leaf(threshold):
    """3 multi-steps: slab state vs per-leaf state → same losses and same
    final params (tight allclose; see module docstring for why not bitwise)."""
    model, data, loss_fn, tx, params = _tiny_setup()
    rng = jax.random.key(1, impl="rbg")
    idx = jnp.asarray(
        np.random.default_rng(3).integers(0, 24, (2, 3, 4)), jnp.int32)

    base = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    base_step = jax.jit(make_device_multi_step(model, loss_fn, tx))
    spec = plan_slabs(params, threshold_bytes=threshold)
    slab_params = slab_pack(params, spec)
    slab = TrainState(jnp.zeros((), jnp.int32), slab_params,
                      tx.init(slab_params))
    slab_step = jax.jit(
        make_device_multi_step(model, loss_fn, tx, slab_spec=spec))

    for mat in idx:
        base, m_base = base_step(base, data, mat, rng)
        slab, m_slab = slab_step(slab, data, mat, rng)
        np.testing.assert_allclose(np.asarray(m_slab["losses"]),
                                   np.asarray(m_base["losses"]),
                                   rtol=1e-5, atol=1e-6)
    _tree_allclose(slab_unpack(slab.params, spec), base.params,
                   rtol=1e-5, atol=1e-6)


def test_single_step_and_eval_with_slab():
    model, data, loss_fn, tx, params = _tiny_setup()
    spec = plan_slabs(params)
    slab_params = slab_pack(params, spec)
    state = TrainState(jnp.zeros((), jnp.int32), slab_params,
                       tx.init(slab_params))
    step = jax.jit(make_device_train_step(model, loss_fn, tx, slab_spec=spec))
    rng = jax.random.key(1, impl="rbg")
    idx = jnp.asarray([0, 1, 2, 3], jnp.int32)
    state, m = step(state, data, idx, rng)
    assert np.isfinite(float(m["loss"]))
    ev_slab = jax.jit(make_device_eval_step(model, slab_spec=spec))
    ev_tree = jax.jit(make_device_eval_step(model))
    np.testing.assert_allclose(
        np.asarray(ev_slab(state.params, data, idx)),
        np.asarray(ev_tree(slab_unpack(state.params, spec), data, idx)),
        rtol=1e-6, atol=1e-7)


def test_checkpoint_layout_round_trip():
    """slab_state_to_tree produces the canonical per-leaf layout (same
    treedef as a per-leaf run's state) and tree_state_to_slab inverts it —
    including the Adam mu/nu moment trees inside opt_state."""
    model, data, loss_fn, tx, params = _tiny_setup()
    spec = plan_slabs(params)
    slab_params = slab_pack(params, spec)
    slab_state = TrainState(jnp.zeros((), jnp.int32), slab_params,
                            tx.init(slab_params))
    step = jax.jit(make_device_train_step(model, loss_fn, tx, slab_spec=spec))
    rng = jax.random.key(1, impl="rbg")
    slab_state, _ = step(slab_state, data,
                         jnp.asarray([0, 1, 2, 3], jnp.int32), rng)

    tree_state = slab_state_to_tree(slab_state, spec)
    # canonical layout == what a per-leaf run would checkpoint
    ref_state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    assert (jax.tree.structure(tree_state) == jax.tree.structure(ref_state))

    back = tree_state_to_slab(slab_state, tree_state, spec)
    assert jax.tree.structure(back) == jax.tree.structure(slab_state)
    for x, y in zip(jax.tree.leaves(back), jax.tree.leaves(slab_state)):
        np.testing.assert_array_equal(np.asarray(x, np.float32),
                                      np.asarray(y, np.float32))


def test_slabbed_is_pytree():
    s = Slabbed({"float32": jnp.zeros(4)}, (jnp.ones((2, 2)),))
    leaves = jax.tree.leaves(s)
    assert len(leaves) == 2
    s2 = jax.tree.map(lambda x: x + 1, s)
    assert isinstance(s2, Slabbed)
    np.testing.assert_array_equal(np.asarray(s2.packs["float32"]), np.ones(4))


def test_trainer_flat_slab_end_to_end_and_ckpt_interchange(tmp_path):
    """Trainer.fit_device_resident with flat_slab=True: runs, learns, and its
    checkpoints INTERCHANGE with non-slab runs (canonical on-disk layout) —
    train 2 epochs slabbed, resume 2 more un-slabbed, and vice versa."""
    from multimodal_classification_tpu.config import (
        DataConfig, ExperimentConfig, TrainingConfig,
    )
    from multimodal_classification_tpu.training.train import Trainer
    from tests.test_device_cache import _dataset

    cfg = tiny_vilbert_config(dtype="float32", use_pallas_attention=False,
                              v_feature_size=32)
    model = ViLBERTForClassification(cfg)
    ds = _dataset(32)
    batch0 = {k: np.stack([ds.get(i)[k] for i in range(2)]) for k in ds.get(0)}
    params0 = jax.tree.map(
        np.asarray, model.init(jax.random.key(0), **model_inputs(batch0))["params"])

    def run(ckpt_dir, *, flat_slab, num_epochs, resume=False):
        tcfg = TrainingConfig(batch_size=8, num_epochs=num_epochs,
                              learning_rate=5e-4, warmup_steps=3,
                              early_stopping_patience=50, mesh_shape=(1, 1),
                              checkpoint_dir=ckpt_dir, flat_slab=flat_slab)
        ex = ExperimentConfig(name="fs", model=cfg, training=tcfg,
                              data=DataConfig())
        trainer = Trainer(model, ex, checkpoint_dir=ckpt_dir)
        return trainer.fit_device_resident(
            ds, ds, jax.tree.map(np.copy, params0), resume=resume)

    # slab run end-to-end; returned state is canonical layout
    state, hist = run(str(tmp_path / "a"), flat_slab=True, num_epochs=2)
    assert np.isfinite(hist["train_loss"]).all()
    ref_tree = jax.tree.structure(params0)
    assert jax.tree.structure(
        jax.tree.map(np.asarray, state.params)) == ref_tree

    # slab checkpoint → non-slab resume
    _state2, hist2 = run(str(tmp_path / "a"), flat_slab=False, num_epochs=4,
                         resume=True)
    assert len(hist2["train_loss"]) == 4

    # non-slab checkpoint → slab resume
    run(str(tmp_path / "b"), flat_slab=False, num_epochs=2)
    _state3, hist3 = run(str(tmp_path / "b"), flat_slab=True, num_epochs=4,
                         resume=True)
    assert len(hist3["train_loss"]) == 4


def test_trainer_flat_slab_freeze_ablation_fallback(tmp_path):
    """A freeze ablation config that inherits ``flat_slab: true`` from the
    flagship training block must auto-fall-back to the per-leaf optimizer
    (multi_transform's freeze labels are per-leaf) instead of raising — and
    the frozen leaves must actually stay frozen (train.py round-5 fallback)."""
    from multimodal_classification_tpu.config import (
        DataConfig, ExperimentConfig, TrainingConfig,
    )
    from multimodal_classification_tpu.training.train import Trainer
    from tests.test_device_cache import _dataset

    cfg = tiny_vilbert_config(dtype="float32", use_pallas_attention=False,
                              v_feature_size=32)
    model = ViLBERTForClassification(cfg)
    ds = _dataset(16)
    batch0 = {k: np.stack([ds.get(i)[k] for i in range(2)]) for k in ds.get(0)}
    params0 = jax.tree.map(
        np.asarray, model.init(jax.random.key(0), **model_inputs(batch0))["params"])

    tcfg = TrainingConfig(batch_size=8, num_epochs=1, learning_rate=5e-4,
                          warmup_steps=2, early_stopping_patience=50,
                          mesh_shape=(1, 1),
                          checkpoint_dir=str(tmp_path), flat_slab=True)
    ex = ExperimentConfig(name="fs_freeze", model=cfg, training=tcfg,
                          data=DataConfig(), freeze_bert_layers=1)
    trainer = Trainer(model, ex, checkpoint_dir=str(tmp_path))
    state, hist = trainer.fit_device_resident(
        ds, ds, jax.tree.map(np.copy, params0), resume=False)
    assert np.isfinite(hist["train_loss"]).all()

    # frozen subtrees (embeddings + text layer_0) are bit-unchanged; at
    # least one trainable leaf moved
    out = jax.tree.map(np.asarray, state.params)
    from multimodal_classification_tpu.training.train import freeze_labels
    labels = freeze_labels(params0, 1)
    moved = 0
    for (pa, a), (_pb, b), (_pl, lab) in zip(
            jax.tree_util.tree_flatten_with_path(params0)[0],
            jax.tree_util.tree_flatten_with_path(out)[0],
            jax.tree_util.tree_flatten_with_path(labels)[0]):
        if lab == "freeze":
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"frozen leaf changed: {jax.tree_util.keystr(pa)}")
        elif not np.array_equal(np.asarray(a), np.asarray(b)):
            moved += 1
    assert moved > 0


def test_fuzz_random_trees_round_trip_and_vjp():
    """Randomized structures: nested dicts with mixed dtypes/shapes must
    round-trip bit-exactly at every threshold, and the custom-vjp backward
    must equal the repacked per-leaf gradient."""
    rng = np.random.default_rng(7)
    dtypes = [jnp.float32, jnp.bfloat16, jnp.int32]
    for trial in range(8):
        tree = {}
        n_leaves = int(rng.integers(3, 12))
        for i in range(n_leaves):
            shape = tuple(int(s) for s in
                          rng.integers(1, 40, size=int(rng.integers(1, 4))))
            dt = dtypes[int(rng.integers(0, len(dtypes)))]
            arr = jnp.asarray(rng.standard_normal(shape) * 10, dt)
            d = tree
            for part in [f"l{int(x)}" for x in
                         rng.integers(0, 3, size=int(rng.integers(1, 3)))]:
                d = d.setdefault(part, {})
            d[f"leaf{i}"] = arr
        for threshold in (64, 4096, -1):
            spec = plan_slabs(tree, threshold_bytes=threshold)
            back = slab_unpack(slab_pack(tree, spec), spec)
            assert jax.tree.structure(back) == jax.tree.structure(tree)
            for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
                assert a.dtype == b.dtype
                np.testing.assert_array_equal(np.asarray(a, np.float32),
                                              np.asarray(b, np.float32))
        # vjp check on the float leaves only (grads don't flow to ints)
        ftree = jax.tree.map(lambda a: a.astype(jnp.float32), tree)
        spec = plan_slabs(ftree, threshold_bytes=256)
        unpack = make_unpack(spec)
        g_slab = jax.grad(
            lambda s: sum(jnp.sum(x * x) for x in jax.tree.leaves(unpack(s)))
        )(slab_pack(ftree, spec))
        g_tree = jax.grad(
            lambda t: sum(jnp.sum(x * x) for x in jax.tree.leaves(t))
        )(ftree)
        expect = slab_pack(g_tree, spec)
        for a, b in zip(jax.tree.leaves(g_slab), jax.tree.leaves(expect)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
