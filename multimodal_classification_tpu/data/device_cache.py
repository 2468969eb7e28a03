"""Device-resident dataset: keep precomputed features in HBM, gather on device.

TPU-first observation: the headline pipeline trains on *precomputed* region
features (Facebook's LMDB: 8500 train examples × 100×2048). In bf16 that is
~3.5 GB — it fits in a v5e's 16 GB HBM alongside the 250M-param model and
optimizer state. Uploading the tensorised dataset **once** and gathering each
batch by index inside the jitted train step eliminates the per-step
host→device feed entirely (the reference re-reads LMDB + re-tokenises per
item per epoch; even our prefetching loader still pays per-step transfer,
which dominates on low-bandwidth host links).

Multi-chip dp: shard the example axis over the mesh's ``dp`` axis and draw
per-device indices from the local shard (each device gathers locally; no
collectives on the input path).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_classification_tpu.data.loader import MemesDataset


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceData:
    """Tensorised dataset resident on device (leaves are jnp arrays).

    ``visual_features`` may be stored int8 with per-(example, region)
    max-abs scales (``feature_scales``); ``gather`` dequantises the gathered
    batch to bf16 on device. int8 halves HBM/upload again vs bf16 (the full
    8500-meme LMDB train split fits in ~1.7 GB)."""

    input_ids: jnp.ndarray  # [N, L] int32
    attention_mask: jnp.ndarray  # [N, L] bf16/f32
    token_type_ids: jnp.ndarray  # [N, L] int32
    visual_features: jnp.ndarray  # [N, R, D] (bf16/f32, or int8 quantised)
    visual_attention_mask: jnp.ndarray  # [N, R]
    spatial_locations: jnp.ndarray  # [N, R, 5]
    labels: jnp.ndarray  # [N] int32
    feature_scales: Optional[jnp.ndarray] = None  # [N, R] f32 when int8
    # host-computed max real text length (static metadata, not a leaf):
    # lets seq_bucket() answer without a device op — the relay's
    # executable-load stalls made a device max-reduce here the single
    # flakiest step of the bench's critical path (round 4)
    max_text_len: Optional[int] = dataclasses.field(
        default=None, metadata=dict(static=True))

    @property
    def num_examples(self) -> int:
        return self.input_ids.shape[0]

    def gather(self, indices: jnp.ndarray,
               seq_bucket: Optional[int] = None) -> Dict[str, jnp.ndarray]:
        """Batch by index — runs on device inside the jitted step.

        ``seq_bucket`` (static) slices the text axis to the dataset's real
        max token length rounded up to a bucket: attention over padded keys
        is −1e9-masked, so outputs for real tokens are bit-for-bit the same
        function — the framework just stops spending MXU cycles on padding
        the reference always computes (its max_seq_length=128 is a cap; meme
        texts are ~12-25 tokens)."""
        feats = jnp.take(self.visual_features, indices, axis=0)
        if self.feature_scales is not None:
            scales = jnp.take(self.feature_scales, indices, axis=0)
            feats = feats.astype(jnp.bfloat16) * scales[..., None].astype(jnp.bfloat16)
        s = slice(None, seq_bucket)
        batch = {
            "input_ids": jnp.take(self.input_ids, indices, axis=0)[:, s],
            "attention_mask": jnp.take(self.attention_mask, indices, axis=0)[:, s],
            "token_type_ids": jnp.take(self.token_type_ids, indices, axis=0)[:, s],
            "visual_features": feats,
            "visual_attention_mask": jnp.take(self.visual_attention_mask, indices, axis=0),
            "spatial_locations": jnp.take(self.spatial_locations, indices, axis=0),
            "labels": jnp.take(self.labels, indices, axis=0),
        }
        return batch

    def seq_bucket(self, multiple: int = 32) -> int:
        """Smallest multiple of ``multiple`` covering the longest real text.
        Uses the host-recorded ``max_text_len`` when present (no device op);
        falls back to a device reduce for DeviceData built by other means."""
        if self.max_text_len is not None:
            max_len = int(self.max_text_len)
        else:
            lengths = jnp.sum(self.attention_mask.astype(jnp.int32), axis=-1)
            max_len = int(jax.device_get(jnp.max(lengths)))
        cap = self.input_ids.shape[1]
        return min(max(-(-max_len // multiple) * multiple, multiple), cap)


def tensorise_host(ds: MemesDataset, feature_dtype=jnp.bfloat16
                   ) -> Tuple[Dict[str, np.ndarray], int]:
    """Tensorise a MemesDataset to host numpy arrays in the exact field
    layout/dtypes of :class:`DeviceData` (shared by the one-shot upload and
    the capacity-capped rotation path). Returns (fields, max_text_len)."""
    import ml_dtypes  # numpy bf16 support (ships with jax)

    n = len(ds)
    feats = np.zeros((n, ds.max_regions, ds.feature_dim), np.float32)
    spatial = np.zeros((n, ds.max_regions, 5), np.float32)
    vmask = np.zeros((n, ds.max_regions), np.float32)
    for i in range(n):
        item = ds.get(i)
        feats[i] = item["visual_features"]
        spatial[i] = item["spatial_locations"]
        vmask[i] = item["visual_attention_mask"]

    if feature_dtype in ("int8", np.int8, jnp.int8):
        # per-(example, region) max-abs quantisation; dequantised to bf16 at
        # gather time — the model consumes features in bf16 anyway
        scales = np.abs(feats).max(axis=-1) / 127.0  # [N, R]
        scales = np.maximum(scales, 1e-8)
        feat_np = np.clip(np.round(feats / scales[..., None]), -127, 127).astype(np.int8)
        scale_np = scales.astype(np.float32)
        np_dtype = ml_dtypes.bfloat16
    else:
        np_dtype = np.dtype(feature_dtype) if feature_dtype != jnp.bfloat16 else ml_dtypes.bfloat16
        feat_np = feats.astype(np_dtype)
        scale_np = None
    fields = {
        "input_ids": ds.input_ids.astype(np.int32),
        "attention_mask": ds.attention_mask.astype(np_dtype),
        "token_type_ids": ds.token_type_ids.astype(np.int32),
        "visual_features": feat_np,
        "visual_attention_mask": vmask.astype(np_dtype),
        "spatial_locations": spatial.astype(np_dtype),
        "labels": ds.labels.astype(np.int32),
    }
    if scale_np is not None:
        fields["feature_scales"] = scale_np
    return fields, int(ds.attention_mask.sum(axis=-1).max())


def device_data_from_fields(
    fields: Dict[str, np.ndarray], max_text_len: int,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> DeviceData:
    """Upload pre-tensorised host fields (one transfer per field)."""

    def put(x):
        if sharding is not None:
            return jax.device_put(x, sharding)
        return jax.device_put(x)

    return DeviceData(
        **{k: put(v) for k, v in fields.items()},
        max_text_len=max_text_len,
    )


def build_device_data(
    ds: MemesDataset,
    feature_dtype=jnp.bfloat16,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> DeviceData:
    """Tensorise a MemesDataset and upload it (one transfer per field).

    ``feature_dtype`` is the wire/storage dtype for the dense feature arrays —
    bf16 matches the model's compute dtype, so no quality is lost relative to
    the bf16 matmuls, at half the HBM/transfer cost.
    """
    fields, max_text_len = tensorise_host(ds, feature_dtype)
    return device_data_from_fields(fields, max_text_len, sharding)


def epoch_indices(
    num_examples: int, batch_size: int, epoch: int, seed: int = 42, drop_last: bool = True
) -> Iterator[np.ndarray]:
    """Deterministic per-epoch shuffled index batches (host-side ints only —
    the sole thing crossing the wire per step)."""
    rng = np.random.default_rng((seed, epoch))
    order = rng.permutation(num_examples)
    end = num_examples - (num_examples % batch_size) if drop_last else num_examples
    for start in range(0, end, batch_size):
        chunk = order[start : start + batch_size]
        if len(chunk) < batch_size:
            chunk = np.concatenate([chunk, order[: batch_size - len(chunk)]])
        yield chunk.astype(np.int32)


def make_device_train_step(model, loss_fn, tx, seq_bucket: Optional[int] = None,
                           grads_dtype: Optional[str] = None, slab_spec=None):
    """Jitted train step over device-resident data: (state, data, indices, rng).

    The gather happens inside the compiled program — batch bytes never cross
    the host link. ``seq_bucket``: see DeviceData.gather.

    ``slab_spec`` (training/flat_slab.py): the state's params/moments are
    flat per-dtype slabs; the model consumes an unpacked view and the whole
    optimizer chain runs over contiguous buffers.
    """
    from multimodal_classification_tpu.training.train import (
        TrainState, cast_grads, model_inputs,
    )

    import optax

    view = _make_param_view(slab_spec)

    def step(state: "TrainState", data: DeviceData, indices: jnp.ndarray, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        batch = data.gather(indices, seq_bucket)

        def loss_of(params):
            out = model.apply(
                {"params": view(params)},
                **model_inputs(batch),
                deterministic=False,
                rngs={"dropout": rng},
            )
            return loss_fn(out["logits"], batch["labels"], None)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        grads = cast_grads(grads, grads_dtype)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), {"loss": loss}

    return step


def _make_param_view(slab_spec):
    """Identity, or the differentiable slab→tree view (training/flat_slab.py)
    whose VJP lands gradients directly in contiguous slabs."""
    if slab_spec is None:
        return lambda p: p
    from multimodal_classification_tpu.training.flat_slab import make_unpack

    return make_unpack(slab_spec)


def make_device_multi_step(model, loss_fn, tx, unroll: int = 1,
                           seq_bucket: Optional[int] = None,
                           grads_dtype: Optional[str] = None,
                           pack_carry: bool = False, slab_spec=None):
    """K training steps per dispatch via lax.scan over an index matrix
    [K, B] — amortises host dispatch latency and lets XLA pipeline step
    boundaries. The whole epoch can be one compiled call.

    ``pack_carry`` flattens the TrainState's small leaves (biases/LayerNorm
    params + their Adam moments) into per-dtype vectors across the scan —
    see training/packing.py for the profile-driven rationale. Numerically
    exact either way.

    ``slab_spec`` (training/flat_slab.py) goes further: the state KEEPS the
    slab layout through the step, so the optimizer itself updates contiguous
    buffers (pack_carry only repacked between iterations; the update still
    ran per-leaf). Mutually exclusive with pack_carry.
    """
    from multimodal_classification_tpu.training.train import (
        TrainState, cast_grads, model_inputs,
    )

    import optax

    if pack_carry and slab_spec is not None:
        raise ValueError("pack_carry and slab_spec are mutually exclusive")
    view = _make_param_view(slab_spec)

    def one(state: "TrainState", data: DeviceData, indices: jnp.ndarray, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        batch = data.gather(indices, seq_bucket)

        def loss_of(params):
            out = model.apply(
                {"params": view(params)},
                **model_inputs(batch),
                deterministic=False,
                rngs={"dropout": rng},
            )
            return loss_fn(out["logits"], batch["labels"], None)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        grads = cast_grads(grads, grads_dtype)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), loss

    def multi(state: "TrainState", data: DeviceData, index_matrix: jnp.ndarray,
              rng: jax.Array):
        def body(st, idx):
            return one(st, data, idx, rng)

        if pack_carry:
            from multimodal_classification_tpu.training.packing import (
                plan_packing, scan_packed,
            )

            spec = plan_packing(state)
            state, losses = scan_packed(body, state, index_matrix, spec,
                                        unroll=unroll)
        else:
            state, losses = jax.lax.scan(body, state, index_matrix, unroll=unroll)
        return state, {"loss": jnp.mean(losses), "losses": losses}

    return multi


def make_device_eval_step(model, seq_bucket: Optional[int] = None,
                          slab_spec=None):
    from multimodal_classification_tpu.training.train import model_inputs

    view = _make_param_view(slab_spec)

    def eval_step(params, data: DeviceData, indices: jnp.ndarray):
        batch = data.gather(indices, seq_bucket)
        out = model.apply({"params": view(params)}, **model_inputs(batch),
                          deterministic=True)
        return out["logits"].astype(jnp.float32)

    return eval_step


# ---------------------------------------------------------------------------
# Multi-chip dp: dataset sharded over the mesh's example axis
# ---------------------------------------------------------------------------


def build_sharded_device_data(ds: MemesDataset, mesh, feature_dtype=jnp.bfloat16):
    """Shard the tensorised dataset's example axis over the mesh's ``dp``
    axis. Example count is truncated to a multiple of dp (the dropped tail is
    at most dp-1 examples per epoch — re-randomised shuffling covers them
    across epochs in expectation only; use the host loader if exactness of
    the tail matters)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = mesh.shape["dp"]
    data = build_device_data(ds, feature_dtype=feature_dtype,
                             sharding=None)  # host-side numpy staging below
    n = (data.num_examples // dp) * dp
    sharding = NamedSharding(mesh, P("dp"))

    def put(x):
        if x is None:
            return None
        return jax.device_put(np.asarray(x)[:n], sharding)

    out = DeviceData(**{
        f.name: (getattr(data, f.name) if f.metadata.get("static")
                 else put(getattr(data, f.name)))
        for f in dataclasses.fields(DeviceData)})
    if n < data.num_examples and out.max_text_len is not None:
        # the truncated tail may have held the longest text; recompute over
        # the kept range so seq_bucket() is never a bucket larger than the
        # shard needs (outputs identical either way — padding is masked)
        return dataclasses.replace(out, max_text_len=int(
            ds.attention_mask[:n].sum(axis=-1).max()))
    return out


def sharded_epoch_indices(
    num_examples: int, dp: int, batch_size: int, epoch: int, seed: int = 42,
    drop_last: bool = True,
) -> Iterator[np.ndarray]:
    """Per-device shard-local index batches: [dp, B/dp] int32 where row d
    indexes into shard d (values < num_examples/dp). Shard-then-shuffle —
    the standard distributed input discipline.

    drop_last=False pads the final partial batch by wrapping to the head of
    each shard's order (eval callers dedup by global index so wrapped rows
    never double-count — see Trainer.fit_device_resident eval_metrics)."""
    assert batch_size % dp == 0
    per_dev = batch_size // dp
    shard_n = num_examples // dp
    rng = np.random.default_rng((seed, epoch))
    orders = [rng.permutation(shard_n) for _ in range(dp)]
    end = shard_n - (shard_n % per_dev) if drop_last else shard_n
    for start in range(0, end, per_dev):
        rows = []
        for o in orders:
            chunk = o[start : start + per_dev]
            if len(chunk) < per_dev:
                chunk = np.concatenate([chunk, o[: per_dev - len(chunk)]])
            rows.append(chunk)
        yield np.stack(rows).astype(np.int32)


def _make_local_gather(mesh):
    """shard_map'd per-device gather: each device indexes its local dataset
    shard with its row of the [dp, B/dp] index matrix — no input collectives."""
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    # P("dp") as a pytree *prefix* shards every DeviceData leaf's example axis
    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=P("dp"),
        check_rep=False,
    )
    def local_gather(data_shard: DeviceData, local_idx):
        # inside shard_map: data_shard leaves are the per-device blocks,
        # local_idx is [1, B/dp] (dp axis split) — plain local indexing
        idx = local_idx[0]
        return jax.tree.map(lambda a: a[idx], data_shard)

    return local_gather


def _gathered_batch(local_gather, data: DeviceData, local_indices,
                    seq_bucket=None):
    batch_data = local_gather(data, local_indices)
    batch = {f.name: getattr(batch_data, f.name)
             for f in dataclasses.fields(DeviceData)}
    scales = batch.pop("feature_scales", None)
    if scales is not None:  # int8-stored features → dequantise
        batch["visual_features"] = (
            batch["visual_features"].astype(jnp.bfloat16)
            * scales[..., None].astype(jnp.bfloat16)
        )
    if seq_bucket is not None:  # see DeviceData.gather
        for k in ("input_ids", "attention_mask", "token_type_ids"):
            batch[k] = batch[k][:, :seq_bucket]
    return batch


def make_sharded_device_train_step(model, loss_fn, tx, mesh,
                                   seq_bucket=None, grads_dtype=None):
    """Multi-chip device-resident train step: each device gathers its batch
    slice from its local dataset shard (shard_map — no data collectives on
    the input path), then the usual dp training step; gradient all-reduce is
    inserted by XLA from the shardings. ``grads_dtype="bfloat16"`` also
    halves the all-reduce bytes on ICI.

    Composes with tensor parallelism: on a dp × mp mesh the dataset stays
    dp-sharded (replicated over mp) and the params carry the Megatron TP
    rules (parallel/mesh.py) — the shard_map here only touches data +
    indices, so GSPMD partitions the model math over mp independently."""
    from multimodal_classification_tpu.training.train import (
        TrainState, cast_grads, model_inputs,
    )

    import optax

    local_gather = _make_local_gather(mesh)

    def step(state: "TrainState", data: DeviceData, local_indices, rng):
        rng = jax.random.fold_in(rng, state.step)
        batch = _gathered_batch(local_gather, data, local_indices, seq_bucket)

        def loss_of(params):
            out = model.apply(
                {"params": params}, **model_inputs(batch),
                deterministic=False, rngs={"dropout": rng},
            )
            return loss_fn(out["logits"], batch["labels"], None)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        grads = cast_grads(grads, grads_dtype)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), {"loss": loss}

    return step


def make_sharded_device_eval_step(model, mesh, seq_bucket=None):
    """Multi-chip device-resident eval: shard-local gather → forward →
    fp32 logits (globally [B, C], dp-sharded on the batch axis)."""
    from multimodal_classification_tpu.training.train import model_inputs

    local_gather = _make_local_gather(mesh)

    def eval_step(params, data: DeviceData, local_indices):
        batch = _gathered_batch(local_gather, data, local_indices, seq_bucket)
        out = model.apply({"params": params}, **model_inputs(batch),
                          deterministic=True)
        return out["logits"].astype(jnp.float32)

    return eval_step
