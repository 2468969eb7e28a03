"""Capacity-capped shard-rotating device-resident training (data/rotation.py).

The core exactness claim: a rotating shard is a contiguous row range of the
tensorised arrays, so a step on (shard s, local idx) computes EXACTLY what a
full-resident step on global idx = s·shard_rows + local computes — verified
by running both paths through the same jitted step and comparing losses and
final params bit-for-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_classification_tpu.config import (
    DataConfig,
    ExperimentConfig,
    TrainingConfig,
    tiny_vilbert_config,
)
from multimodal_classification_tpu.data.device_cache import (
    build_device_data,
    make_device_train_step,
    tensorise_host,
)
from multimodal_classification_tpu.data.rotation import (
    RotatingDeviceData,
    dataset_nbytes,
)
from multimodal_classification_tpu.models.vilbert import ViLBERTForClassification
from multimodal_classification_tpu.training.losses import get_loss_function
from multimodal_classification_tpu.training.train import (
    TrainState,
    Trainer,
    model_inputs,
)
from tests.test_device_cache import _dataset


def _rotating(ds, shards_wanted, batch_size=None, double_buffer=True):
    fields, mtl = tensorise_host(ds, jnp.float32)
    total = dataset_nbytes(fields)
    buffers = 2 if double_buffer else 1
    cap = int(total / shards_wanted * buffers) + 1
    return RotatingDeviceData(fields, mtl, cap, batch_size=batch_size,
                              double_buffer=double_buffer)


class TestSchedule:
    def test_shard_sizing_respects_cap(self):
        ds = _dataset(30)
        r = _rotating(ds, shards_wanted=3)
        assert r.num_shards >= 3
        assert r.shard_rows * r.num_shards >= r.num_examples

    def test_epoch_covers_each_example_at_most_once(self):
        ds = _dataset(30)
        r = _rotating(ds, shards_wanted=3)
        seen = []
        for _sd, local, gidx in r.epoch_batches(4, epoch=1, seed=7):
            assert len(local) == 4
            seen.extend(gidx.tolist())
        assert len(seen) == len(set(seen))          # no duplicates
        assert all(0 <= g < 30 for g in seen)
        assert len(seen) == r.steps_per_epoch(4) * 4

    def test_schedule_is_deterministic_and_epoch_keyed(self):
        ds = _dataset(30)
        r = _rotating(ds, shards_wanted=3)

        def order(epoch):
            return [g for _s, _l, gidx in r.epoch_batches(4, epoch, seed=7)
                    for g in gidx.tolist()]

        assert order(1) == order(1)
        assert order(1) != order(2)

    def test_cap_at_full_size_is_single_shard(self):
        ds = _dataset(20)
        fields, mtl = tensorise_host(ds, jnp.float32)
        r = RotatingDeviceData(fields, mtl, dataset_nbytes(fields) + 1,
                               double_buffer=False)
        assert r.num_shards == 1
        full = build_device_data(ds, feature_dtype=jnp.float32)
        (sd, local, gidx), = list(r.epoch_batches(20, epoch=0, seed=0))
        np.testing.assert_array_equal(np.asarray(sd.visual_features),
                                      np.asarray(full.visual_features))
        np.testing.assert_array_equal(sorted(gidx), np.arange(20))

    def test_tail_shard_pads_by_wrapping_but_never_samples_pads(self):
        ds = _dataset(26)  # shard_rows won't divide 26
        r = _rotating(ds, shards_wanted=3)
        tail = r.num_shards - 1
        real = r.shard_real_rows(tail)
        assert real < r.shard_rows or r.num_examples % r.shard_rows == 0
        for _sd, local, gidx in r.epoch_batches(2, epoch=0, seed=1):
            assert (gidx < 26).all()


def test_rotating_trajectory_bit_equals_full_resident():
    """Drive the SAME jitted step with (shard, local) and (full, global):
    losses and updated params must match bit-for-bit."""
    cfg = tiny_vilbert_config(dtype="float32", use_pallas_attention=False,
                              v_feature_size=32)
    model = ViLBERTForClassification(cfg)
    ds = _dataset(24)
    full = build_device_data(ds, feature_dtype=jnp.float32)
    rot = _rotating(ds, shards_wanted=3, batch_size=4)
    loss_fn = get_loss_function("ce")
    tx = optax.adamw(1e-3)
    batch0 = {k: np.stack([ds.get(i)[k] for i in range(4)]) for k in ds.get(0)}
    params = model.init(jax.random.key(0), **model_inputs(batch0))["params"]
    step = jax.jit(make_device_train_step(model, loss_fn, tx))
    rng = jax.random.key(1, impl="rbg")

    s_rot = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    s_full = TrainState(jnp.zeros((), jnp.int32),
                        jax.tree.map(jnp.array, params), tx.init(params))
    n = 0
    for sd, local, gidx in rot.epoch_batches(4, epoch=1, seed=5):
        s_rot, m_rot = step(s_rot, sd, jnp.asarray(local), rng)
        s_full, m_full = step(s_full, full, jnp.asarray(gidx), rng)
        assert float(m_rot["loss"]) == float(m_full["loss"])
        n += 1
    assert n >= 3
    for a, b in zip(jax.tree.leaves(s_rot.params),
                    jax.tree.leaves(s_full.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_fit_with_small_cap_end_to_end(tmp_path):
    """Trainer.fit_device_resident with a cap forcing ≥3 shards runs the
    full epoch loop (train + eval + checkpoint) and learns."""
    cfg = tiny_vilbert_config(dtype="float32", use_pallas_attention=False,
                              v_feature_size=32)
    model = ViLBERTForClassification(cfg)
    ds = _dataset(32)
    fields, _ = tensorise_host(ds, jnp.float32)
    cap = int(dataset_nbytes(fields) * 2 / 3)  # 2 buffers / 3+ shards
    tcfg = TrainingConfig(batch_size=4, num_epochs=2, learning_rate=5e-4,
                          warmup_steps=3, early_stopping_patience=50,
                          mesh_shape=(1, 1),
                          checkpoint_dir=str(tmp_path / "ckpt"),
                          device_cache_max_bytes=cap)
    ex = ExperimentConfig(name="rot", model=cfg, training=tcfg,
                          data=DataConfig())
    trainer = Trainer(model, ex, checkpoint_dir=str(tmp_path / "ckpt"))
    batch0 = {k: np.stack([ds.get(i)[k] for i in range(2)]) for k in ds.get(0)}
    params = model.init(jax.random.key(0), **model_inputs(batch0))["params"]
    _state, history = trainer.fit_device_resident(ds, ds, params)
    assert len(history["train_loss"]) == 2
    assert np.isfinite(history["train_loss"]).all()
    assert len(history["val_auroc"]) == 2


def test_rotation_with_int8_feature_storage():
    """int8-stored features (feature_scales field) rotate correctly: shard
    gathers dequantise to the same values the full-resident int8 path
    yields for the same global indices."""
    ds = _dataset(24)
    fields, mtl = tensorise_host(ds, jnp.int8)
    assert "feature_scales" in fields
    full = build_device_data(ds, feature_dtype=jnp.int8)
    cap = int(dataset_nbytes(fields) * 2 / 3)
    rot = RotatingDeviceData(fields, mtl, cap, batch_size=4)
    assert rot.num_shards >= 3
    for sd, local, gidx in rot.epoch_batches(4, epoch=2, seed=9):
        a = sd.gather(jnp.asarray(local))
        b = full.gather(jnp.asarray(gidx))
        np.testing.assert_array_equal(
            np.asarray(a["visual_features"], np.float32),
            np.asarray(b["visual_features"], np.float32))
        np.testing.assert_array_equal(np.asarray(a["labels"]),
                                      np.asarray(b["labels"]))


def test_double_buffer_uploads_each_shard_once_per_epoch(monkeypatch):
    """The prefetched next shard must be REUSED when its turn comes (not
    re-uploaded): count device_put calls across one epoch."""
    import jax as _jax
    from multimodal_classification_tpu.data import rotation as rot_mod

    ds = _dataset(24)
    r = _rotating(ds, shards_wanted=3, batch_size=4)
    n_fields = len(r.fields)
    calls = {"n": 0}
    real_put = _jax.device_put

    def counting_put(x, *a, **k):
        calls["n"] += 1
        return real_put(x, *a, **k)

    monkeypatch.setattr(rot_mod.jax, "device_put", counting_put)
    for _ in r.epoch_batches(4, epoch=0, seed=3):
        pass
    # one device_put per field per shard — the double-buffer prefetch is
    # consumed, never thrown away and re-uploaded
    assert calls["n"] == r.num_shards * n_fields, (calls["n"], r.num_shards)


def test_rotation_resume_continues_trajectory(tmp_path):
    """device_cache_max_bytes + resume: an interrupted capped run resumed
    with the remaining epoch budget reproduces the uninterrupted capped run
    (the rotation schedule is epoch-keyed, so resume re-enters it exactly)."""
    cfg = tiny_vilbert_config(dtype="float32", use_pallas_attention=False,
                              v_feature_size=32)
    model = ViLBERTForClassification(cfg)
    ds = _dataset(32)
    fields, _ = tensorise_host(ds, jnp.float32)
    cap = int(dataset_nbytes(fields) * 2 / 3)
    batch0 = {k: np.stack([ds.get(i)[k] for i in range(2)]) for k in ds.get(0)}
    params0 = jax.tree.map(
        np.asarray, model.init(jax.random.key(0), **model_inputs(batch0))["params"])

    def run(ckpt_dir, num_epochs, resume=False):
        # constant LR after warmup: total_steps then doesn't enter the
        # schedule, so the interrupted and uninterrupted runs share the
        # exact trajectory (no decay-horizon artifact)
        tcfg = TrainingConfig(batch_size=4, num_epochs=num_epochs,
                              learning_rate=5e-4, warmup_steps=3,
                              use_linear_decay=False,
                              early_stopping_patience=50, mesh_shape=(1, 1),
                              checkpoint_dir=ckpt_dir,
                              device_cache_max_bytes=cap)
        ex = ExperimentConfig(name="rr", model=cfg, training=tcfg,
                              data=DataConfig())
        trainer = Trainer(model, ex, checkpoint_dir=ckpt_dir)
        _s, hist = trainer.fit_device_resident(
            ds, ds, jax.tree.map(np.copy, params0), resume=resume)
        return hist

    h_once = run(str(tmp_path / "a"), num_epochs=4)
    run(str(tmp_path / "b"), num_epochs=2)
    h_res = run(str(tmp_path / "b"), num_epochs=4, resume=True)
    assert len(h_res["train_loss"]) == 4
    np.testing.assert_allclose(h_res["train_loss"], h_once["train_loss"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(h_res["val_auroc"], h_once["val_auroc"],
                               rtol=1e-5)
