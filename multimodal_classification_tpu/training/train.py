"""Jitted train/eval engine.

TPU-native redesign of the reference's torch loop (nodes.py:712-841):
- one jitted, donated ``train_step`` (AdamW eps 1e-8 + warmup-linear schedule
  + global-norm clip 1.0 — exact reference hyperparameters) running over a
  (dp, mp) mesh; gradients all-reduce over ICI automatically via sharding;
- eval step returns fp32 logits; AUROC/accuracy/F1 computed host-side
  (reference used sklearn on the host too, nodes.py:907-930);
- early stopping on val AUROC with patience (reference: nodes.py:825-834),
  but the best state goes to an Orbax checkpoint (full state, resumable)
  instead of a CPU RAM clone;
- layer freezing as an optax ``multi_transform`` zero-update partition
  (reference: vilbert_facebook_arch.py:586-608 flips requires_grad).
"""

from __future__ import annotations

import dataclasses
import inspect
import json
import logging
import os
import signal
import time
from typing import Any, Callable, Dict, Iterable, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_classification_tpu.config import ExperimentConfig, TrainingConfig
from multimodal_classification_tpu.parallel.mesh import (
    batch_sharding,
    build_mesh,
    param_shardings,
)
from multimodal_classification_tpu.training.losses import get_loss_function
from multimodal_classification_tpu.training.metrics import binary_metrics
from multimodal_classification_tpu.training.schedule import warmup_linear_schedule
from multimodal_classification_tpu.utils.checkpoint import CheckpointManager
from multimodal_classification_tpu.utils.tracking import NullTracker, Tracker

logger = logging.getLogger(__name__)

MODEL_INPUT_KEYS = (
    "input_ids",
    "attention_mask",
    "token_type_ids",
    "visual_features",
    "visual_attention_mask",
    "spatial_locations",
)


def freeze_labels(params: Any, freeze_bert_layers: int) -> Any:
    """'train'/'freeze' labels pytree: freezing embeddings + first N text
    layers (reference semantics, vilbert_facebook_arch.py:586-608)."""

    def label(path, _leaf) -> str:
        keys = [p.key for p in path if hasattr(p, "key")]
        if freeze_bert_layers <= 0 or not keys or keys[0] != "bert":
            return "train"
        if keys[1] == "encoder" and len(keys) > 2 and keys[2] == "stack":
            raise ValueError(
                "freeze_bert_layers is incompatible with stacked_encoder: "
                "per-layer freezing cannot partition a stacked [K,...] leaf "
                "(use the canonical encoder layout for freeze ablations)"
            )
        if keys[1] == "embeddings":
            return "freeze"
        if keys[1] == "encoder" and keys[2].startswith("layer_"):
            idx = int(keys[2].split("_")[1])
            if idx < freeze_bert_layers:
                return "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    tcfg: TrainingConfig,
    total_steps: int,
    params: Optional[Any] = None,
    freeze_bert_layers: int = 0,
) -> optax.GradientTransformation:
    schedule = warmup_linear_schedule(
        tcfg.learning_rate, tcfg.warmup_steps, total_steps, tcfg.use_linear_decay
    )
    from multimodal_classification_tpu.training.optimizers import adamw_mixed

    tx = optax.chain(
        optax.clip_by_global_norm(tcfg.gradient_clip) if tcfg.gradient_clip > 0 else optax.identity(),
        adamw_mixed(
            schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=tcfg.weight_decay,
            mu_dtype=jnp.dtype(tcfg.adam_mu_dtype),
            nu_dtype=jnp.dtype(getattr(tcfg, "adam_nu_dtype", "float32")),
        ),
    )
    if freeze_bert_layers > 0:
        assert params is not None
        labels = freeze_labels(params, freeze_bert_layers)
        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
    if tcfg.grad_accum_steps > 1:
        if jnp.dtype(getattr(tcfg, "grads_dtype", "float32")) != jnp.float32:
            raise ValueError(
                "grad_accum_steps>1 with low-precision grads_dtype would "
                "accumulate in bf16; set grads_dtype='float32'"
            )
        tx = optax.MultiSteps(tx, every_k_schedule=tcfg.grad_accum_steps)
    return tx


@dataclasses.dataclass
class TrainState:
    """Minimal state pytree (registered below)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any


jax.tree_util.register_dataclass(
    TrainState, data_fields=["step", "params", "opt_state"], meta_fields=[]
)


def model_inputs(batch: Mapping[str, Any]) -> Dict[str, Any]:
    return {k: batch[k] for k in MODEL_INPUT_KEYS if k in batch}


def _accepts_epoch(fn: Callable) -> bool:
    """True if a data callable takes an epoch argument (used for exactly
    reproducible per-epoch shuffles across resumes)."""
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return False
    return len([
        p for p in sig.parameters.values()
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
    ]) >= 1


def cast_grads(grads, dtype: Optional[str]):
    """Optionally store gradients low-precision (config.grads_dtype): the cast
    fuses into the backward's final ops, so grad buffers materialise in HBM at
    half width — saving the bwd write + global-norm read + Adam read."""
    if not dtype or jnp.dtype(dtype) == jnp.float32:
        return grads
    d = jnp.dtype(dtype)
    return jax.tree.map(lambda g: g.astype(d), grads)


def make_train_step(model, loss_fn, tx, grads_dtype: Optional[str] = None) -> Callable:
    def train_step(state: TrainState, batch: Mapping[str, jnp.ndarray], rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_of(params):
            out = model.apply(
                {"params": params},
                **model_inputs(batch),
                deterministic=False,
                rngs={"dropout": rng},
            )
            return loss_fn(out["logits"], batch["labels"], batch.get("weights")), out["logits"]

        (loss, logits), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        grads = cast_grads(grads, grads_dtype)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)
        metrics = {"loss": loss}
        return new_state, metrics

    return train_step


def make_eval_step(model) -> Callable:
    def eval_step(params, batch):
        out = model.apply({"params": params}, **model_inputs(batch), deterministic=True)
        return out["logits"].astype(jnp.float32)

    return eval_step


def make_quant_eval_step(model) -> Callable:
    """Int8-serving eval step: the quant tree (ops.quant.build_quant_tree)
    rides as an argument, not a closure, so it lives in HBM instead of being
    baked into the program as literals."""

    def eval_step(params, quant, batch):
        out = model.apply(
            {"params": params, "quant": quant}, **model_inputs(batch), deterministic=True
        )
        return out["logits"].astype(jnp.float32)

    return eval_step


class _PreemptionGuard:
    """Graceful-preemption handler for the duration of a fit: on SIGTERM
    (the signal TPU-VM maintenance/preemption delivers before the grace
    window closes), flip ``requested`` so the epoch loop checkpoints full
    state and exits cleanly — ``fit(..., resume=True)`` then continues the
    exact trajectory. The reference loses everything on any interruption
    (its best state lives in RAM until save_model — SURVEY.md §5)."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self.requested = False
        self._signals = signals
        self._old = {}

    def _on(self, signum, frame):
        self.requested = True
        logger.warning(
            "signal %d received: will checkpoint full state at the end of "
            "this epoch and stop (resume with resume=True)", signum
        )

    def __enter__(self):
        for s in self._signals:
            try:
                self._old[s] = signal.signal(s, self._on)
            except ValueError:  # not the main thread — run unguarded
                pass
        return self

    def __exit__(self, *exc):
        for s, h in self._old.items():
            signal.signal(s, h)
        return False


class Trainer:
    """Epoch-level orchestration: train → validate → early-stop → checkpoint.

    Data sources are callables returning fresh numpy-batch iterators per epoch
    (each batch: MODEL_INPUT_KEYS + 'labels' [+ 'weights' marking real
    examples in padded final batches — XLA needs static batch shapes, so
    partial batches are padded rather than shape-specialised]).
    """

    def __init__(
        self,
        model,
        experiment: ExperimentConfig,
        mesh=None,
        tracker: Optional[Tracker] = None,
        checkpoint_dir: Optional[str] = None,
    ):
        self.model = model
        self.cfg = experiment
        self.tcfg = experiment.training
        self.mesh = mesh if mesh is not None else build_mesh(
            self.tcfg.mesh_shape, self.tcfg.mesh_axis_names
        )
        if self.mesh.shape.get("mp", 1) > 1 and (
            getattr(model.cfg, "fused_ffn_training", False)
            or getattr(model.cfg, "fused_attn_block_training", False)
        ):
            # tensor-parallel training shards the layer weights over mp; the
            # fused TRAINING Pallas kernels expect whole (replicated) weight
            # operands, so the partitioner would all-gather them every step —
            # keep the unfused XLA path, which shards cleanly (same rule as
            # ServingModel's fused-kernel handling under a tp mesh).
            import dataclasses

            from multimodal_classification_tpu.models.vilbert import (
                ViLBERTForClassification,
            )

            if isinstance(model, ViLBERTForClassification):
                self.model = model = ViLBERTForClassification(
                    dataclasses.replace(
                        model.cfg, fused_ffn_training=False,
                        fused_attn_block_training=False))
        self.tracker = tracker or NullTracker()
        self.ckpt = CheckpointManager(
            checkpoint_dir or self.tcfg.checkpoint_dir, keep=self.tcfg.keep_checkpoints
        )
        self.loss_fn = get_loss_function(
            loss_type=self.tcfg.loss_type,
            alpha=self.tcfg.focal_alpha,
            gamma=self.tcfg.focal_gamma,
            smoothing=self.tcfg.label_smoothing,
            class_weights=self.tcfg.class_weights,
        )
        dp = self.mesh.shape.get("dp", 1)
        if self.tcfg.batch_size % dp != 0:
            raise ValueError(
                f"batch_size {self.tcfg.batch_size} must be divisible by the "
                f"dp mesh axis ({dp} devices)"
            )
        self._batch_sharding = batch_sharding(self.mesh)
        self.history: Dict[str, list] = {"train_loss": [], "val_loss": [], "val_auroc": []}

    # ------------------------------------------------------------------
    def init_state(self, params, total_steps: int) -> Tuple[TrainState, Callable, Callable]:
        tx = make_optimizer(
            self.tcfg, total_steps, params, self.cfg.freeze_bert_layers
        )
        sh = param_shardings(params, self.mesh)
        params = jax.tree.map(jax.device_put, params, sh)
        opt_state = jax.jit(tx.init, out_shardings=None)(params)
        state = TrainState(jnp.zeros((), jnp.int32), params, opt_state)
        train_step = jax.jit(
            make_train_step(self.model, self.loss_fn, tx,
                            grads_dtype=self.tcfg.grads_dtype),
            donate_argnums=0,
        )
        eval_step = jax.jit(make_eval_step(self.model))
        return state, train_step, eval_step

    def put_batch(self, batch: Mapping[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        return {
            k: jax.device_put(v, self._batch_sharding) for k, v in batch.items()
        }

    # ------------------------------------------------------------------
    def fit(
        self,
        train_data: Callable[[], Iterable[Mapping[str, np.ndarray]]],
        val_data: Callable[[], Iterable[Mapping[str, np.ndarray]]],
        steps_per_epoch: int,
        init_params=None,
        rng_seed: Optional[int] = None,
        resume: bool = False,
    ) -> Tuple[TrainState, Dict[str, list]]:
        """Train with per-epoch validation + early stopping.

        ``resume=True`` restores the FULL train state from the "last"
        checkpoint — params, optimizer state (so Adam moments and the LR
        schedule's step counter continue exactly), step, epoch, best-AUROC /
        patience bookkeeping, and history — producing the same trajectory an
        uninterrupted run would (the dropout stream is keyed on the restored
        step, and epoch data order is keyed on the epoch when ``train_data``
        accepts one). Mid-run resume is something the reference lacks
        entirely (SURVEY.md §5: best state lives in RAM).
        """
        tcfg = self.tcfg
        seed = tcfg.seed if rng_seed is None else rng_seed
        rng = jax.random.key(seed, impl=tcfg.rng_impl)

        if init_params is None:
            raise ValueError("init_params required (use models.init_params)")
        total_steps = steps_per_epoch * tcfg.num_epochs
        state, train_step, eval_step = self.init_state(init_params, total_steps)
        start_epoch = 1
        best_auroc, patience, best_epoch = 0.0, 0, 0
        if resume and self.ckpt.exists("last"):
            template = {
                "state": state,
                "meta": {"epoch": 0, "best_auroc": 0.0, "patience": 0,
                         "best_epoch": 0},
            }
            restored = self.ckpt.restore("last", template)
            sh = param_shardings(restored["state"].params, self.mesh)
            state = TrainState(
                jax.device_put(restored["state"].step),
                jax.tree.map(jax.device_put, restored["state"].params, sh),
                jax.tree.map(jax.device_put, restored["state"].opt_state),
            )
            meta = restored["meta"]
            start_epoch = int(meta["epoch"]) + 1
            best_auroc = float(meta["best_auroc"])
            patience = int(meta["patience"])
            best_epoch = int(meta["best_epoch"])
            hist_path = os.path.join(self.ckpt.directory, "history.json")
            if os.path.exists(hist_path):
                with open(hist_path) as f:
                    self.history = json.load(f)
            logger.info(
                "resumed full state from epoch %d (step %d, best %.4f)",
                start_epoch - 1, int(np.asarray(state.step)), best_auroc,
            )

        n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(state.params))
        self.tracker.log_params(
            {
                "model_total_params": n_params,
                "learning_rate": tcfg.learning_rate,
                "loss_type": tcfg.loss_type,
                "batch_size": tcfg.batch_size,
                "num_epochs": tcfg.num_epochs,
                "warmup_steps": tcfg.warmup_steps,
                "weight_decay": tcfg.weight_decay,
                "mesh": str(dict(self.mesh.shape)),
                "devices": len(self.mesh.devices.flat),
            }
        )

        dropout_rng = jax.random.fold_in(rng, 1)
        takes_epoch = _accepts_epoch(train_data)

        with _PreemptionGuard() as guard:
            for epoch in range(start_epoch, tcfg.num_epochs + 1):
                t0 = time.time()
                losses, n_seen = [], 0
                for batch in (train_data(epoch) if takes_epoch else train_data()):
                    dev_batch = self.put_batch(batch)
                    n_seen += int(batch.get("weights", batch["labels"] * 0 + 1).sum())
                    state, metrics = train_step(state, dev_batch, dropout_rng)
                    losses.append(metrics["loss"])
                train_loss = float(np.mean([np.asarray(l) for l in losses])) if losses else 0.0

                val_metrics = self.evaluate(state.params, val_data, eval_step)
                dt = time.time() - t0
                self.history["train_loss"].append(train_loss)
                self.history["val_loss"].append(val_metrics.get("loss", float("nan")))
                self.history["val_auroc"].append(val_metrics["auroc"])
                self.tracker.log_metrics(
                    {
                        "train_loss": train_loss,
                        "val_loss": val_metrics.get("loss", float("nan")),
                        "val_auroc": val_metrics["auroc"],
                        "val_accuracy": val_metrics["accuracy"],
                        "epoch_seconds": dt,
                        "train_examples_per_sec": n_seen / max(dt, 1e-9),
                    },
                    step=epoch,
                )
                logger.info(
                    "epoch %d: train_loss=%.4f val_loss=%.4f val_auroc=%.4f (%.1fs)",
                    epoch, train_loss, val_metrics.get("loss", float("nan")),
                    val_metrics["auroc"], dt,
                )

                stop = False
                if val_metrics["auroc"] > best_auroc:
                    best_auroc, best_epoch, patience = val_metrics["auroc"], epoch, 0
                    self.ckpt.save("best", {"params": state.params, "epoch": epoch,
                                            "val_auroc": best_auroc})
                else:
                    patience += 1
                    stop = patience >= tcfg.early_stopping_patience
                # "last" is saved on EVERY epoch, including the early-stop one —
                # full state so resume continues the exact trajectory
                self.ckpt.save("last", {
                    "state": state,
                    "meta": {"epoch": epoch, "best_auroc": float(best_auroc),
                             "patience": int(patience), "best_epoch": int(best_epoch)},
                })
                with open(os.path.join(self.ckpt.directory, "history.json"), "w") as f:
                    json.dump(self.history, f)
                if stop:
                    logger.info("early stopping at epoch %d (best %.4f @ %d)",
                                epoch, best_auroc, best_epoch)
                    break
                if guard.requested:
                    logger.info("preemption checkpoint complete at epoch %d; "
                                "stopping cleanly", epoch)
                    break

        # restore best params (reference restores the RAM clone, nodes.py:836-838)
        if self.ckpt.exists("best"):
            restored = self.ckpt.restore("best")
            state = TrainState(state.step, restored["params"], state.opt_state)
        self.tracker.log_metrics({"final_best_auroc": best_auroc}, step=best_epoch)
        return state, self.history

    # ------------------------------------------------------------------
    def fit_device_resident(
        self,
        train_ds,
        val_ds,
        init_params,
        rng_seed: Optional[int] = None,
        resume: bool = False,
    ) -> Tuple[TrainState, Dict[str, list]]:
        """Train with the whole tensorised dataset resident in HBM
        (data/device_cache.py): batches gather by index inside the jitted
        step; only int32 indices cross the host link.

        Multi-chip: with a dp>1 mesh the dataset's example axis is sharded
        over dp, each chip gathers its batch slice from its local shard
        (shard_map, no input collectives), and gradients all-reduce over ICI
        — SURVEY.md §7.4. mp>1 composes: params take the Megatron TP rules
        (parallel/mesh.py) while the dataset stays dp-sharded (replicated
        over mp), and XLA inserts the row-parallel all-reduces.

        Preemption/resume: the full train state is checkpointed as "last" on
        SIGTERM (graceful-preemption window), on early stop, and at the final
        epoch — NOT every epoch, because pulling the ~2.5 GB state over a
        slow relay link each epoch would dominate the 12 s flagship epoch.
        ``resume=True`` continues the exact trajectory from that checkpoint
        (dropout stream is keyed on the restored step; data order on the
        epoch).
        """
        from multimodal_classification_tpu.data.device_cache import (
            build_device_data,
            build_sharded_device_data,
            epoch_indices,
            make_device_eval_step,
            make_device_train_step,
            make_sharded_device_eval_step,
            make_sharded_device_train_step,
            sharded_epoch_indices,
        )

        dp = self.mesh.shape.get("dp", 1)
        mp = self.mesh.shape.get("mp", 1)
        multi = dp * mp > 1
        tcfg = self.tcfg
        seed = tcfg.seed if rng_seed is None else rng_seed
        dtype = jnp.bfloat16 if self.cfg.model.dtype == "bfloat16" else jnp.float32
        rotating = None  # capacity-capped shard rotation (data/rotation.py)
        if multi:
            if tcfg.device_cache_max_bytes is not None:
                logger.info(
                    "device_cache_max_bytes ignored on a multi-chip mesh "
                    "(the dataset shards over dp, giving dp× the capacity)")
            train_data = build_sharded_device_data(train_ds, self.mesh, feature_dtype=dtype)
            val_data = build_sharded_device_data(val_ds, self.mesh, feature_dtype=dtype)
        elif tcfg.device_cache_max_bytes is not None:
            from multimodal_classification_tpu.data.device_cache import (
                device_data_from_fields, tensorise_host,
            )
            from multimodal_classification_tpu.data.rotation import (
                RotatingDeviceData, dataset_nbytes,
            )

            fields, mtl = tensorise_host(train_ds, dtype)
            if dataset_nbytes(fields) > tcfg.device_cache_max_bytes:
                rotating = RotatingDeviceData(
                    fields, mtl, tcfg.device_cache_max_bytes,
                    batch_size=tcfg.batch_size)
            else:
                train_data = device_data_from_fields(fields, mtl)
            val_data = build_device_data(val_ds, feature_dtype=dtype)
        else:
            train_data = build_device_data(train_ds, feature_dtype=dtype)
            val_data = build_device_data(val_ds, feature_dtype=dtype)

        train_meta = rotating if rotating is not None else train_data
        # text-length bucket: identical function (masked padding), fewer FLOPs
        bucket = None
        mult = getattr(self.cfg.data, "text_bucket_multiple", 0)
        if mult:
            bucket = max(train_meta.seq_bucket(mult), val_data.seq_bucket(mult))
            if bucket >= val_data.input_ids.shape[1]:
                bucket = None
            else:
                logger.info("text bucket: %d of %d tokens", bucket,
                            val_data.input_ids.shape[1])

        if rotating is not None:
            steps_per_epoch = max(rotating.steps_per_epoch(tcfg.batch_size), 1)
        else:
            steps_per_epoch = max(train_data.num_examples // tcfg.batch_size, 1)
        total_steps = steps_per_epoch * tcfg.num_epochs
        tx = make_optimizer(tcfg, total_steps, init_params, self.cfg.freeze_bert_layers)
        slab_spec = None
        if getattr(tcfg, "flat_slab", False) and not multi:
            # contiguous per-dtype param/moment buffers (training/flat_slab.py)
            if self.cfg.freeze_bert_layers > 0:
                # multi_transform's freeze labels are per-leaf — fall back to
                # the per-leaf optimizer rather than failing the ablation
                # configs that inherit a flat_slab training block
                logger.info("flat_slab disabled: freeze_bert_layers=%d "
                            "partitions per-leaf", self.cfg.freeze_bert_layers)
                slab_spec = None
            else:
                from multimodal_classification_tpu.training.flat_slab import (
                    plan_slabs, slab_pack,
                )

                slab_spec = plan_slabs(init_params)
                init_params = slab_pack(init_params, slab_spec)
                logger.info("flat-slab optimizer: %d small leaves slabbed, "
                            "%d kept per-leaf", len(slab_spec.small),
                            len(slab_spec.large_positions))
        if multi:
            # params carry the TP rules (replicated when mp == 1 — every rule
            # spec is size-1 on a degenerate mp axis); the shard_map gather
            # only touches data + indices, so the dp batch sharding and the
            # mp param sharding compose inside one jitted program
            from multimodal_classification_tpu.parallel.mesh import shard_params

            init_params = shard_params(init_params, self.mesh)
            opt_state = jax.jit(tx.init, out_shardings=None)(init_params)
            step = jax.jit(
                make_sharded_device_train_step(self.model, self.loss_fn, tx,
                                               self.mesh, seq_bucket=bucket,
                                               grads_dtype=tcfg.grads_dtype),
                donate_argnums=0,
            )
            eval_step = jax.jit(
                make_sharded_device_eval_step(self.model, self.mesh, seq_bucket=bucket)
            )
        else:
            opt_state = tx.init(init_params)
            step = jax.jit(
                make_device_train_step(self.model, self.loss_fn, tx, seq_bucket=bucket,
                                       grads_dtype=tcfg.grads_dtype,
                                       slab_spec=slab_spec),
                donate_argnums=0,
            )
            eval_step = jax.jit(make_device_eval_step(self.model, seq_bucket=bucket,
                                                      slab_spec=slab_spec))
        state = TrainState(jnp.zeros((), jnp.int32), init_params, opt_state)
        rng = jax.random.key(seed, impl=tcfg.rng_impl)

        def _val_batches(n):
            if multi:
                yield from sharded_epoch_indices(n, dp, tcfg.batch_size, 0, seed=0,
                                                 drop_last=False)
            else:
                yield from epoch_indices(n, tcfg.batch_size, 0, seed=0, drop_last=False)

        def eval_metrics(params) -> Dict[str, float]:
            logits_all, labels_all, gidx_all = [], [], []
            n = val_data.num_examples
            labels_host = np.asarray(val_data.labels)
            for idx in _val_batches(n):
                logits = np.asarray(eval_step(params, val_data, jnp.asarray(idx)))
                logits_all.append(logits)
                if multi:
                    # shard-local rows: global example = shard * (n/dp) + idx
                    shard_n = n // dp
                    gidx = (np.arange(dp)[:, None] * shard_n + idx).reshape(-1)
                    labels_all.append(labels_host[gidx])
                    gidx_all.append(gidx)
                else:
                    labels_all.append(labels_host[idx])
            logits = np.concatenate(logits_all)
            labels = np.concatenate(labels_all)
            if not multi:
                logits, labels = logits[:n], labels[:n]
            else:
                # drop wrap-padded duplicates from the final partial batch
                _, first = np.unique(np.concatenate(gidx_all), return_index=True)
                logits, labels = logits[first], labels[first]
            z = logits - logits.max(-1, keepdims=True)
            p = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
            nll = -np.log(np.maximum(p[np.arange(len(labels)), labels], 1e-12)).mean()
            return binary_metrics(labels, p[:, 1], loss=float(nll))

        def _train_batches(epoch):
            """Yield (resident_data, index_batch) — the resident data is the
            single uploaded set, or the rotating shard window when capped."""
            if rotating is not None:
                for sd, idx, _gidx in rotating.epoch_batches(
                        tcfg.batch_size, epoch, seed=seed):
                    yield sd, idx
            elif multi:
                for idx in sharded_epoch_indices(
                        train_data.num_examples, dp, tcfg.batch_size, epoch,
                        seed=seed):
                    yield train_data, idx
            else:
                for idx in epoch_indices(train_data.num_examples,
                                         tcfg.batch_size, epoch, seed=seed):
                    yield train_data, idx

        # checkpoints always use the canonical per-leaf layout: a flat-slab
        # run saves/restores through these converters, so its checkpoints
        # interchange freely with non-slab runs
        if slab_spec is not None:
            from multimodal_classification_tpu.training.flat_slab import (
                slab_state_to_tree, tree_state_to_slab,
            )

            def _to_disk(st):
                return slab_state_to_tree(st, slab_spec)

            def _from_disk(slab_template, st):
                return tree_state_to_slab(slab_template, st, slab_spec)
        else:
            def _to_disk(st):
                return st

            def _from_disk(_slab_template, st):
                return st

        best_auroc, patience, best_epoch = 0.0, 0, 0
        start_epoch = 1
        if resume and self.ckpt.exists("last"):
            template = {
                "state": _to_disk(state),
                "meta": {"epoch": 0, "best_auroc": 0.0, "patience": 0, "best_epoch": 0},
            }
            restored = self.ckpt.restore("last", template)
            restored["state"] = _from_disk(state, restored["state"])
            if multi:
                from multimodal_classification_tpu.parallel.mesh import replicated

                # re-place each restored leaf exactly where the fresh init put
                # it (params: TP rules; opt_state: whatever tx.init propagated)
                state = TrainState(
                    jax.device_put(restored["state"].step, replicated(self.mesh)),
                    jax.tree.map(lambda x, ref: jax.device_put(x, ref.sharding),
                                 restored["state"].params, state.params),
                    jax.tree.map(lambda x, ref: jax.device_put(x, ref.sharding),
                                 restored["state"].opt_state, state.opt_state),
                )
            else:
                state = TrainState(
                    jax.device_put(restored["state"].step),
                    jax.tree.map(jax.device_put, restored["state"].params),
                    jax.tree.map(jax.device_put, restored["state"].opt_state),
                )
            meta = restored["meta"]
            start_epoch = int(meta["epoch"]) + 1
            best_auroc = float(meta["best_auroc"])
            patience = int(meta["patience"])
            best_epoch = int(meta["best_epoch"])
            hist_path = os.path.join(self.ckpt.directory, "history.json")
            if os.path.exists(hist_path):
                with open(hist_path) as f:
                    self.history = json.load(f)
            logger.info("resumed device-resident training from epoch %d (step %d)",
                        start_epoch - 1, int(np.asarray(state.step)))

        def _save_last(epoch):
            self.ckpt.save("last", {
                "state": _to_disk(state),
                "meta": {"epoch": epoch, "best_auroc": float(best_auroc),
                         "patience": int(patience), "best_epoch": int(best_epoch)},
            })
            with open(os.path.join(self.ckpt.directory, "history.json"), "w") as f:
                json.dump(self.history, f)

        with _PreemptionGuard() as guard:
            for epoch in range(start_epoch, tcfg.num_epochs + 1):
                t0 = time.time()
                losses = []
                for resident, idx in _train_batches(epoch):
                    state, m = step(state, resident, jnp.asarray(idx), rng)
                    losses.append(m["loss"])
                train_loss = float(np.mean([np.asarray(l) for l in losses])) if losses else 0.0
                vm = eval_metrics(state.params)
                dt = time.time() - t0
                self.history["train_loss"].append(train_loss)
                self.history["val_loss"].append(vm.get("loss", float("nan")))
                self.history["val_auroc"].append(vm["auroc"])
                self.tracker.log_metrics(
                    {"train_loss": train_loss, "val_loss": vm.get("loss", float("nan")),
                     "val_auroc": vm["auroc"], "val_accuracy": vm["accuracy"],
                     "epoch_seconds": dt,
                     "train_examples_per_sec": steps_per_epoch * tcfg.batch_size / max(dt, 1e-9)},
                    step=epoch,
                )
                logger.info("epoch %d: train_loss=%.4f val_auroc=%.4f (%.1fs, device-resident)",
                            epoch, train_loss, vm["auroc"], dt)
                stop = False
                if vm["auroc"] > best_auroc:
                    best_auroc, best_epoch, patience = vm["auroc"], epoch, 0
                    self.ckpt.save("best", {"params": _to_disk(state).params,
                                            "epoch": epoch,
                                            "val_auroc": best_auroc})
                else:
                    patience += 1
                    stop = patience >= tcfg.early_stopping_patience
                if stop or guard.requested or epoch == tcfg.num_epochs:
                    _save_last(epoch)
                if guard.requested:
                    logger.info("preemption checkpoint complete at epoch %d; "
                                "stopping cleanly", epoch)
                    break
                if stop:
                    logger.info("early stopping at epoch %d (best %.4f @ %d)",
                                epoch, best_auroc, best_epoch)
                    break
        if slab_spec is not None:
            # hand the caller the canonical layout (pipelines save/export it)
            state = _to_disk(state)
        if self.ckpt.exists("best"):
            restored = self.ckpt.restore("best")
            state = TrainState(state.step, restored["params"], state.opt_state)
        self.tracker.log_metrics({"final_best_auroc": best_auroc}, step=best_epoch)
        return state, self.history

    # ------------------------------------------------------------------
    def evaluate(
        self,
        params,
        data: Callable[[], Iterable[Mapping[str, np.ndarray]]],
        eval_step: Optional[Callable] = None,
    ) -> Dict[str, float]:
        if eval_step is None:
            eval_step = jax.jit(make_eval_step(self.model))
        all_logits, all_labels, all_w = [], [], []
        for batch in data():
            dev_batch = self.put_batch(model_inputs(batch))
            logits = np.asarray(eval_step(params, dev_batch))
            w = np.asarray(batch.get("weights", np.ones(len(batch["labels"]))))
            keep = w > 0
            all_logits.append(logits[keep])
            all_labels.append(np.asarray(batch["labels"])[keep])
        logits = np.concatenate(all_logits)
        labels = np.concatenate(all_labels)
        # softmax → P(class 1) (reference nodes.py:915-918)
        z = logits - logits.max(-1, keepdims=True)
        p = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
        nll = -np.log(np.maximum(p[np.arange(len(labels)), labels], 1e-12)).mean()
        return binary_metrics(labels, p[:, 1], loss=float(nll))
