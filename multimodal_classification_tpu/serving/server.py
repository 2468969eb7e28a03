"""Serving runtime: micro-batching HTTP inference over the jitted eval step.

The reference's closest surface is the offline ``run_inference`` Kedro node
(reference: pipelines/model_training/nodes.py:967-1009 — a DataFrame sweep);
it has no online serving story. This is the TPU deployment path:

- ONE compiled program: requests are padded into a fixed ``[B, ...]`` batch
  (XLA static shapes — no per-request recompiles) and masked out on the way
  back; weights stay resident.
- Host work stays native: WordPiece tokenization (the C++ batch kernel via
  ``data/tokenizer.py``) and feature lookup from any ``FeatureStore``
  (LMDB / HDF5 / extractor-backed), with the reference's zero-feature
  fallback for unknown ids (lmdb_dataset.py:149-153).
- Micro-batching: concurrent requests within a linger window share one MXU
  dispatch (queue + batcher thread, futures per request).
- Optional int8 MXU path (``ops/quant.py``) — the serving-throughput config.

The HTTP front is unauthenticated and binds 127.0.0.1 by default: it is a
model-server for a trusted network segment (put auth/TLS at the gateway),
not an internet-facing endpoint.
"""

from __future__ import annotations

import json
import logging
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class DeviceFeatureCache:
    """Visual features resident in HBM, gathered by row index inside the
    compiled step.

    The HTTP serving path was measured 42× below the compiled step's
    capability because every batch-64 dispatch re-shipped ~26 MB of
    ``[B, 100, 2048]`` features over a ~20 MB/s relay link (round-3
    bench_server). Serving by meme id instead keeps the feature tensor on
    device — the full 12,540-meme HatefulMemes set is ≈5.1 GB bf16, well
    inside a v5e's 16 GB next to ~0.5 GB of params — and only token ids +
    row indices cross the link (~8 KB per batch-112 dispatch).

    Mirrors the reference FeatureStore lookup semantics
    (lmdb_dataset.py:126-141) including the zero-feature / all-ones-mask
    fallback for unknown ids, applied ON DEVICE via a masked gather.
    """

    def __init__(self, ids: Sequence[str], feats: np.ndarray,
                 spatial: np.ndarray, mask: np.ndarray, wire_dtype):
        self.index: Dict[str, int] = {str(i): n for n, i in enumerate(ids)}
        self.features = jnp.asarray(feats.astype(wire_dtype))
        self.spatial = jnp.asarray(spatial)
        self.mask = jnp.asarray(mask)

    @classmethod
    def from_store(cls, store, ids: Sequence[str], *, num_regions: int,
                   feature_dim: int, wire_dtype=np.float32,
                   drop_missing: bool = True) -> "DeviceFeatureCache":
        """Assemble the cache host-side from any FeatureStore (one upload per
        field). Ids the store cannot resolve are dropped (they then take the
        on-device zero-feature fallback at lookup time, same as the host
        path)."""
        rows, kept = [], []
        for i in ids:
            got = store.get(str(i))
            if got is None:
                if not drop_missing:
                    raise KeyError(f"feature store has no id {i!r}")
                continue
            rows.append(got)
            kept.append(str(i))
        n = len(kept)
        feats = np.zeros((max(n, 1), num_regions, feature_dim), np.float32)
        spatial = np.zeros((max(n, 1), num_regions, 5), np.float32)
        mask = np.zeros((max(n, 1), num_regions), np.float32)
        for r, (f, s) in enumerate(rows):
            f = np.asarray(f, np.float32)
            s = np.asarray(s, np.float32)
            m = min(len(f), num_regions)
            feats[r, :m] = f[:m, :feature_dim]
            spatial[r, :m] = s[:m, :5]
            mask[r, :m] = 1.0
        return cls(kept, feats, spatial, mask, wire_dtype)

    def indices_for(self, ids: Sequence[Any]) -> np.ndarray:
        return np.asarray(
            [self.index.get(str(i), -1) if i is not None else -1 for i in ids],
            np.int32,
        )

    def arrays(self):
        return self.features, self.spatial, self.mask

    @property
    def nbytes(self) -> int:
        return self.features.nbytes + self.spatial.nbytes + self.mask.nbytes


def _make_cached_eval_step(model, quantized: bool):
    """Eval step taking row INDICES into a device-resident feature cache:
    the gather (plus the unknown-id zero-feature fallback) runs on device,
    so the host ships only token arrays + one int32 index per instance."""

    def gather(cache_feats, cache_spatial, cache_mask, idx):
        safe = jnp.maximum(idx, 0)
        missing = (idx < 0)
        feats = jnp.take(cache_feats, safe, axis=0)
        spatial = jnp.take(cache_spatial, safe, axis=0)
        mask = jnp.take(cache_mask, safe, axis=0)
        feats = jnp.where(missing[:, None, None], 0, feats)
        spatial = jnp.where(missing[:, None, None], 0, spatial)
        # unknown id → zero features with an ALL-ONES mask, exactly the
        # reference's missing-id behavior (lmdb_dataset.py:149-153)
        mask = jnp.where(missing[:, None], 1.0, mask)
        return feats, spatial, mask

    if quantized:
        def step(params, quant, cache_feats, cache_spatial, cache_mask,
                 tokens, idx):
            feats, spatial, mask = gather(cache_feats, cache_spatial,
                                          cache_mask, idx)
            out = model.apply(
                {"params": params, "quant": quant}, **tokens,
                visual_features=feats, visual_attention_mask=mask,
                spatial_locations=spatial, deterministic=True,
            )
            return out["logits"]
    else:
        def step(params, cache_feats, cache_spatial, cache_mask, tokens, idx):
            feats, spatial, mask = gather(cache_feats, cache_spatial,
                                          cache_mask, idx)
            out = model.apply(
                {"params": params}, **tokens,
                visual_features=feats, visual_attention_mask=mask,
                spatial_locations=spatial, deterministic=True,
            )
            return out["logits"]
    return step


class ServingModel:
    """Fixed-shape batched predictor over a trained ViLBERT.

    ``predict`` accepts up to ``batch_size`` instances, pads to the compiled
    shape, and returns ``[n, 2]`` softmax probabilities.
    """

    def __init__(
        self,
        model,
        params,
        tokenizer,
        store=None,
        *,
        max_seq_length: int = 128,
        num_regions: int = 100,
        feature_dim: int = 2048,
        batch_size: int = 16,
        int8: bool = False,
        int8_min_dim: int = 256,
        seq_buckets: Optional[Sequence[int]] = None,
        batch_sizes: Optional[Sequence[int]] = None,
        mesh=None,
    ):
        from multimodal_classification_tpu.training.train import (
            make_eval_step,
            make_quant_eval_step,
        )

        self.tokenizer = tokenizer
        self.store = store
        self.max_seq_length = max_seq_length
        # Sequence-length buckets: each batch dispatches the smallest compiled
        # seq length that fits its longest text. Padding is masked, so logits
        # are identical across buckets (the training path's bucketing
        # exactness tests pin this down); short requests just skip the wasted
        # pad FLOPs — measured +70% throughput at the 32-token bucket vs a
        # single 128-token program. Each bucket is one extra compile of the
        # same jitted step (XLA static shapes).
        buckets = sorted({int(b) for b in (seq_buckets or ()) if 0 < int(b) < max_seq_length})
        self.seq_buckets = tuple(buckets) + (max_seq_length,)
        self.num_regions = num_regions
        self.feature_dim = feature_dim
        self.batch_size = batch_size
        # Batch-size programs: each dispatch pads to the SMALLEST compiled
        # batch that fits (default: just ``batch_size``). A server tuned for
        # throughput compiles e.g. {1, 16, 112} so online singles stop paying
        # the record-batch pad (round-3: batch-1 on the batch-112 int8
        # fused-layer program measured 12.7 ms vs 9.3 unfused — per-batch
        # routing sidesteps the regression by construction). Each size is one
        # extra compile per seq bucket; identical logits (padding is masked).
        sizes = sorted({int(b) for b in (batch_sizes or ()) if 0 < int(b)}
                       | {int(batch_size)})
        self.batch_sizes = tuple(sizes)
        self.batch_size = self.batch_sizes[-1]
        self.params = params
        # Wire dtype for the dense visual-feature tensor (the dominant
        # host→device bytes: batch·regions·feature_dim). The model's
        # VisualEmbeddings casts features to the compute dtype as its first
        # op, so rounding on the HOST is numerically identical and halves
        # the per-dispatch transfer when the model runs bf16 (52 → 26 MB at
        # batch 64 — on a slow host link this is the serving bottleneck,
        # not the device step). f32-compute models keep an f32 wire.
        self._wire_dtype = np.dtype(getattr(model.cfg, "dtype", "float32"))
        if mesh is not None and (
            getattr(model.cfg, "fused_ffn", False)
            or getattr(model.cfg, "fused_attn_block", False)
            or getattr(model.cfg, "fused_co_attn", False)
            or getattr(model.cfg, "fused_text_layer", False)
        ):
            # tensor-parallel serving shards the layer weights over mp; the
            # fused Pallas kernels expect whole (replicated) weight operands,
            # so the partitioner would have to all-gather them every call —
            # keep the unfused XLA path, which shards cleanly.
            import dataclasses

            from multimodal_classification_tpu.models.vilbert import (
                ViLBERTForClassification,
            )

            model = ViLBERTForClassification(dataclasses.replace(
                model.cfg, fused_ffn=False, fused_attn_block=False,
                fused_co_attn=False, fused_text_layer=False))
        self._model = model
        if int8:
            from multimodal_classification_tpu.ops.quant import build_quant_tree

            self._quant = build_quant_tree(params, min_dim=int8_min_dim)
            self._step = jax.jit(make_quant_eval_step(model))
        else:
            self._quant = None
            self._step = jax.jit(make_eval_step(model))
        self._cache: Optional[DeviceFeatureCache] = None
        self._cached_step = None
        # Multi-chip serving: shard the compiled batch over the mesh's dp
        # axis (each chip evaluates batch/dp examples; tp rules shard params
        # over mp when the mesh has one) — XLA inserts the collectives. The
        # serving surface is unchanged; per-dispatch throughput scales with
        # the dp degree.
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from multimodal_classification_tpu.parallel.mesh import (
                batch_sharding,
                replicated,
                shard_params,
            )

            dp = mesh.shape.get("dp", 1)
            if batch_size % max(dp, 1):
                raise ValueError(
                    f"batch_size {batch_size} not divisible by dp={dp}")
            self.params = shard_params(self.params, mesh)
            if self._quant is not None:
                self._quant = jax.device_put(self._quant, replicated(mesh))
            self._batch_sharding = batch_sharding(mesh)

    def calibrate(self, texts: Sequence[str],
                  instances: Optional[Sequence[Dict[str, Any]]] = None):
        """Switch the int8 path to STATIC activation scales calibrated on the
        given examples (typically the validation split). Removes the per-row
        max-reduction before every quantized matmul; see
        ``ops.quant.calibrate_quant_tree`` for the accuracy trade-off."""
        if self._quant is None:
            raise ValueError("calibrate() requires int8=True")
        from multimodal_classification_tpu.ops.quant import calibrate_quant_tree

        batches = []
        for i in range(0, len(texts), self.batch_size):
            chunk = list(texts[i:i + self.batch_size])
            inst = list(instances[i:i + self.batch_size]) if instances else None
            batches.append(self._build_batch(chunk, inst))
        self._quant = calibrate_quant_tree(self._model, self.params,
                                           self._quant, batches)
        logger.info("int8 activation scales calibrated on %d examples", len(texts))

    def preload_features(self, ids: Sequence[str],
                         max_bytes: Optional[int] = None) -> int:
        """Load the given ids' features into HBM and serve id-only requests
        through the device-resident gather path (see DeviceFeatureCache).
        Returns the number of resident rows. Requires a feature store;
        unsupported under a mesh (the cache would need dp replication —
        multi-chip serving keeps the host feature path).

        ``max_bytes`` caps HBM residency for feature sets larger than the
        chip: ids beyond the cap are simply not preloaded — requests for
        them transparently take the host feature path (see
        ``_host_resolvable_misses``), so capping changes throughput for the
        cold tail, never predictions."""
        if self.store is None:
            raise ValueError("preload_features requires a feature store")
        if self.mesh is not None:
            raise ValueError("device feature cache is single-chip only")
        ids = list(ids)
        if max_bytes is not None:
            row_bytes = self.num_regions * (
                self.feature_dim * np.dtype(self._wire_dtype).itemsize
                + 5 * 4 + 4)
            fit = max(int(max_bytes // row_bytes), 0)
            if fit < len(ids):
                logger.warning(
                    "device feature cache capped: %d of %d ids fit in "
                    "%.0f MB (%.0f KB/row) — the rest serve via the host "
                    "feature path", fit, len(ids), max_bytes / 1e6,
                    row_bytes / 1e3)
                ids = ids[:fit]
        self._cache = DeviceFeatureCache.from_store(
            self.store, ids, num_regions=self.num_regions,
            feature_dim=self.feature_dim, wire_dtype=self._wire_dtype,
        )
        self._cached_step = jax.jit(
            _make_cached_eval_step(self._model, self._quant is not None),
            donate_argnums=(),
        )
        logger.info("device feature cache: %d ids, %.0f MB resident",
                    len(self._cache.index), self._cache.nbytes / 1e6)
        return len(self._cache.index)

    def warmup(self):
        """Compile the eval program for every (seq bucket × batch size)
        before taking traffic."""
        for bs in self.batch_sizes:
            for b in self.seq_buckets:
                # b-2 single-piece words + [CLS]/[SEP] tokenize to exactly b
                # ids, landing in bucket b (longer texts truncate)
                _ = self.predict(["w " * max(b - 2, 1)] * bs)
                if self._cache is not None:
                    _ = self.predict(["w " * max(b - 2, 1)] * bs,
                                     [{"id": "?warmup?"}] * bs)

    def _pick_batch(self, n: int) -> int:
        for b in self.batch_sizes:
            if n <= b:
                return b
        return self.batch_sizes[-1]

    def _pick_bucket(self, used_len: int) -> int:
        for b in self.seq_buckets:
            if used_len <= b:
                return b
        return self.seq_buckets[-1]

    def group_by_bucket(self, texts: Sequence[str]) -> List[List[int]]:
        """Partition request indices by seq bucket (order preserved within a
        group). One long text in an iid-mixed batch would otherwise drag the
        whole dispatch onto the longest program — the micro-batcher dispatches
        each group separately so short traffic keeps the short-bucket rate."""
        if len(self.seq_buckets) <= 1 or len(texts) <= 1:
            return [list(range(len(texts)))]
        _, mask, _ = self.tokenizer.encode_batch(list(texts), self.max_seq_length)
        lens = mask.sum(-1)
        groups: Dict[int, List[int]] = {}
        for i, n in enumerate(lens):
            groups.setdefault(self._pick_bucket(int(n)), []).append(i)
        return [groups[b] for b in sorted(groups)]

    def _features_for(self, inst: Dict[str, Any]):
        if inst.get("features") is not None:
            feats = np.asarray(inst["features"], np.float32)
            spatial = np.asarray(
                inst.get("spatial", np.zeros((len(feats), 5), np.float32)), np.float32
            )
        elif self.store is not None and inst.get("id") is not None:
            got = self.store.get(str(inst["id"]))
            if got is None:
                feats = spatial = None
            else:
                feats, spatial = np.asarray(got[0], np.float32), np.asarray(got[1], np.float32)
        else:
            feats = spatial = None
        r, d = self.num_regions, self.feature_dim
        out_f = np.zeros((r, d), np.float32)
        out_s = np.zeros((r, 5), np.float32)
        mask = np.zeros(r, np.float32)
        if feats is None:
            # zero-feature fallback, mask kept all-ones like the reference's
            # datasets (they attend over zero features for missing ids)
            mask[:] = 1.0
            return out_f, out_s, mask
        n = min(len(feats), r)
        out_f[:n] = feats[:n, :d]
        out_s[:n] = spatial[:n, :5]
        mask[:n] = 1.0
        return out_f, out_s, mask

    def _build_batch(self, texts: Sequence[str],
                     instances: Optional[Sequence[Dict[str, Any]]] = None
                     ) -> Dict[str, jnp.ndarray]:
        """Tokenize + look up features + pad to the compiled batch shape."""
        n = len(texts)
        instances = instances or [{} for _ in texts]
        ids_, mask_, type_ = self.tokenizer.encode_batch(list(texts), self.max_seq_length)
        if len(self.seq_buckets) > 1:
            seq = self._pick_bucket(int(mask_.sum(-1).max()))
            ids_, mask_, type_ = ids_[:, :seq], mask_[:, :seq], type_[:, :seq]
        trip = [self._features_for(inst) for inst in instances]
        feats = np.stack([t[0] for t in trip])
        spatial = np.stack([t[1] for t in trip])
        vmask = np.stack([t[2] for t in trip])

        bs = self.batch_size if self.mesh is not None else self._pick_batch(n)

        def pad(x):
            if n == bs:
                return x
            reps = [(0, bs - n)] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, reps)

        batch = {
            "input_ids": pad(ids_),
            "attention_mask": pad(mask_),
            "token_type_ids": pad(type_),
            "visual_features": pad(feats).astype(self._wire_dtype),
            "visual_attention_mask": pad(vmask),
            "spatial_locations": pad(spatial),
        }
        if self._batch_sharding is not None:
            return jax.device_put(batch, self._batch_sharding)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def _predict_cached(self, texts: Sequence[str],
                        instances: Sequence[Dict[str, Any]]):
        """Id-only fast path: ship token arrays + one int32 row index per
        instance; the feature gather runs on device from the resident cache."""
        n = len(texts)
        ids_, mask_, type_ = self.tokenizer.encode_batch(
            list(texts), self.max_seq_length)
        if len(self.seq_buckets) > 1:
            seq = self._pick_bucket(int(mask_.sum(-1).max()))
            ids_, mask_, type_ = ids_[:, :seq], mask_[:, :seq], type_[:, :seq]
        idx = self._cache.indices_for([inst.get("id") for inst in instances])
        bs = self._pick_batch(n)

        def pad(x):
            if n == bs:
                return x
            return np.pad(x, [(0, bs - n)] + [(0, 0)] * (x.ndim - 1))

        tokens = {
            "input_ids": jnp.asarray(pad(ids_)),
            "attention_mask": jnp.asarray(pad(mask_)),
            "token_type_ids": jnp.asarray(pad(type_)),
        }
        # padded rows index -1 → on-device zero-feature fallback (masked out
        # of the returned probabilities anyway)
        idx = jnp.asarray(np.pad(idx, (0, bs - n), constant_values=-1))
        cf, cs, cm = self._cache.arrays()
        if self._quant is not None:
            logits = self._cached_step(self.params, self._quant, cf, cs, cm,
                                       tokens, idx)
        else:
            logits = self._cached_step(self.params, cf, cs, cm, tokens, idx)
        return logits

    def _host_resolvable_misses(self, instances) -> bool:
        """True when some requested id is NOT device-resident but the host
        feature store CAN resolve it (a cache-capped or never-preloaded id):
        such a batch must take the host feature path — letting the cached
        gather's -1 fallback zero it out would silently change predictions.
        Truly-unknown ids (store misses) keep the zero-feature fallback on
        either path, matching the reference's semantics."""
        if self.store is None:
            return False
        for inst in instances:
            i = inst.get("id")
            if i is None:
                continue
            # membership probe only — FeatureStore.__contains__ avoids
            # reading/decoding the full feature row on the hot path (the
            # host path re-reads it anyway when this returns True)
            if str(i) not in self._cache.index and str(i) in self.store:
                return True
        return False

    def predict_async(self, texts: Sequence[str],
                      instances: Optional[Sequence[Dict[str, Any]]] = None):
        """Dispatch one compiled batch and return an opaque handle WITHOUT
        blocking on the device result (jax dispatch is async): the host work
        here (tokenize, pad, upload) overlaps the device compute of the
        previously dispatched batch. Resolve with :meth:`finish`."""
        n = len(texts)
        if n == 0:
            return None, 0
        if n > self.batch_size:
            raise ValueError(f"batch of {n} exceeds compiled size {self.batch_size}")
        if (self._cache is not None and instances is not None
                and len(instances) == n
                and all(i.get("features") is None for i in instances)
                and not self._host_resolvable_misses(instances)):
            logits = self._predict_cached(texts, instances)
        else:
            batch = self._build_batch(texts, instances)
            if self._quant is not None:
                logits = self._step(self.params, self._quant, batch)
            else:
                logits = self._step(self.params, batch)
        return logits, n

    def finish(self, handle) -> np.ndarray:
        """Block on a :meth:`predict_async` handle → probabilities [n, 2]."""
        logits, n = handle
        if logits is None:
            return np.zeros((0, 2), np.float32)
        logits = np.asarray(logits)[:n]
        z = logits - logits.max(-1, keepdims=True)
        p = np.exp(z)
        return (p / p.sum(-1, keepdims=True)).astype(np.float32)

    def predict(self, texts: Sequence[str],
                instances: Optional[Sequence[Dict[str, Any]]] = None) -> np.ndarray:
        return self.finish(self.predict_async(texts, instances))


class _MicroBatcher:
    """Collect requests for up to ``linger_ms`` (or until the compiled batch
    is full) and resolve them with one model dispatch.

    Dispatch is PIPELINED: the collector thread tokenizes/pads/dispatches
    (jax dispatch is async) and hands the in-flight device result to a
    completion thread that blocks on it and resolves the futures — so batch
    N+1's host work and upload overlap batch N's device compute + result
    roundtrip. ``pipeline_depth`` bounds the number of in-flight dispatches
    (the queue put blocks when full, which is the backpressure)."""

    def __init__(self, serving: ServingModel, linger_ms: float = 5.0,
                 pipeline_depth: int = 2,
                 busy_hold_ms: Optional[float] = None):
        self.serving = serving
        self.linger_s = linger_ms / 1000.0
        # After the linger expires with a batch in flight, keep collecting
        # for at most this long before dispatching anyway (None = hold until
        # the in-flight batch completes — the throughput policy; a finite
        # cap trades batch size for latency at low concurrency, where the
        # hold was measured as ~15 ms of the 44 ms online p50).
        self.busy_hold_s = (None if busy_hold_ms is None
                            else busy_hold_ms / 1000.0)
        self.q: "queue.Queue" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "max_batch": 0}
        # per-phase host-time attribution (seconds, count) — answers WHERE a
        # request's latency goes (round-4 weak #5: ~12 ms of online p50 was
        # unattributed above relay-roundtrip + compute):
        #   collect   first-dequeue → dispatch decision (linger / busy-wait)
        #   group     seq-bucket grouping (tokenize pass 1)
        #   dispatch  predict_async (tokenize pass 2 + pad + upload + enqueue)
        #   device    finish() blocking on the device result (roundtrip+compute)
        #   resolve   future set_result loop (client-thread wakeup handoff)
        self.phases: Dict[str, list] = {
            k: [0.0, 0] for k in
            ("collect", "group", "dispatch", "device", "resolve")}
        # ring buffer of recent request latencies (enqueue → result), seconds
        self._lat = [0.0] * 1024
        self._lat_n = 0
        self._pending: "queue.Queue" = queue.Queue(
            maxsize=max(1, int(pipeline_depth)))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._completer = threading.Thread(target=self._complete, daemon=True)
        self._thread.start()
        self._completer.start()

    def submit(self, instance: Dict[str, Any]) -> Future:
        fut: Future = Future()
        self.q.put((instance, fut, time.perf_counter()))
        return fut

    def latency_stats(self) -> Dict[str, float]:
        """p50/p99/mean request latency (ms) over the last ≤1024 requests."""
        n = min(self._lat_n, len(self._lat))
        if n == 0:
            return {}
        lat = np.sort(np.asarray(self._lat[:n])) * 1000.0
        return {
            "latency_ms_p50": round(float(lat[int(0.50 * (n - 1))]), 3),
            "latency_ms_p99": round(float(lat[int(0.99 * (n - 1))]), 3),
            "latency_ms_mean": round(float(lat.mean()), 3),
        }

    def phase_stats(self) -> Dict[str, float]:
        """Mean ms per BATCH of each pipeline phase (see ``phases``)."""
        out = {}
        for k, (total, count) in self.phases.items():
            if count:
                out[f"phase_{k}_ms_mean"] = round(total / count * 1000.0, 3)
        return out

    def _phase(self, name: str, dt: float):
        p = self.phases[name]
        p[0] += dt
        p[1] += 1

    def reset_stats(self):
        """Zero the latency ring + phase accumulators (benches call this
        between modes so each mode's attribution is its own)."""
        self._lat_n = 0
        for p in self.phases.values():
            p[0], p[1] = 0.0, 0

    def _record_latency(self, t_enq: float):
        self._lat[self._lat_n % len(self._lat)] = time.perf_counter() - t_enq
        self._lat_n += 1

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)
        self._completer.join(timeout=5)

    def _run(self):
        while not self._stop.is_set():
            try:
                first = self.q.get(timeout=0.1)
            except queue.Empty:
                continue
            t_first = time.perf_counter()
            items = [first]
            deadline = t_first + self.linger_s
            while (len(items) < self.serving.batch_size
                   and not self._stop.is_set()):
                try:
                    items.append(self.q.get_nowait())
                    continue
                except queue.Empty:
                    pass
                # linger for co-arriving requests; after the linger expires,
                # dispatch ahead only when the pipeline is IDLE — if a batch
                # is already in flight, keep collecting until it completes:
                # a tiny batch dispatched behind it would only pay the fixed
                # per-dispatch cost (~29 ms roundtrip on this link) again,
                # while every request collected here rides one program free
                # (measured: eager depth-2 dispatch gave mean batch 6.6 and
                # 211 rps where collect-while-busy gives ~15 and ~290).
                # busy_hold_s bounds that wait for latency-sensitive
                # deployments (round-5 breakdown: the hold is ~15 ms of the
                # 44 ms online p50 at 4 connections).
                now = time.perf_counter()
                if now >= deadline:
                    if self._pending.unfinished_tasks == 0:
                        break
                    if (self.busy_hold_s is not None
                            and now >= deadline + self.busy_hold_s):
                        break
                self._stop.wait(0.0005)
            self.stats["requests"] += len(items)
            self._phase("collect", time.perf_counter() - t_first)
            texts = [str(i.get("text", "")) for i, _, _ in items]
            # length-grouped dispatch: each seq bucket gets its own batch so
            # one long request doesn't drag co-arriving short ones onto the
            # longest compiled program
            t_g = time.perf_counter()
            groups = self.serving.group_by_bucket(texts)
            self._phase("group", time.perf_counter() - t_g)
            for idx in groups:
                insts = [items[i][0] for i in idx]
                futs = [items[i][1] for i in idx]
                enq_ts = [items[i][2] for i in idx]
                self.stats["batches"] += 1
                self.stats["max_batch"] = max(self.stats["max_batch"], len(idx))
                t_d = time.perf_counter()
                try:
                    handle = self.serving.predict_async(
                        [texts[i] for i in idx], insts)
                except Exception as e:  # pragma: no cover - surfaced to client
                    logger.exception("batch dispatch failed")
                    for f in futs:
                        if not f.done():
                            f.set_exception(e)
                    continue
                self._phase("dispatch", time.perf_counter() - t_d)
                # blocks when pipeline_depth dispatches are in flight
                self._pending.put((handle, futs, enq_ts))

    def _fail_queued(self, exc: Exception):
        """Fail every future still waiting in the intake queue (used when the
        collector is gone — otherwise clients hang until their HTTP timeout)."""
        while True:
            try:
                _, fut, _ = self.q.get_nowait()
            except queue.Empty:
                return
            if not fut.done():
                fut.set_exception(exc)

    def _complete(self):
        while True:
            try:
                handle, futs, enq_ts = self._pending.get(timeout=0.1)
            except queue.Empty:
                # exit whenever the collector thread is gone — clean close()
                # OR a fatal collector error (without the latter, a dead
                # collector would leave this thread polling forever and
                # queued futures unresolved)
                if not self._thread.is_alive():
                    self._fail_queued(RuntimeError("micro-batcher stopped"))
                    return
                continue
            try:
                t_w = time.perf_counter()
                probs = self.serving.finish(handle)
                t_r = time.perf_counter()
                self._phase("device", t_r - t_w)
                for f, p, t0 in zip(futs, probs, enq_ts):
                    f.set_result({
                        "probability": float(p[1]),
                        "prediction": int(np.argmax(p)),
                    })
                    self._record_latency(t0)
                self._phase("resolve", time.perf_counter() - t_r)
            except Exception as e:  # pragma: no cover - surfaced to client
                logger.exception("batch failed")
                for f in futs:
                    if not f.done():
                        f.set_exception(e)
            finally:
                # collectors poll unfinished_tasks to decide whether the
                # device is busy (put increments it, this decrements)
                self._pending.task_done()


class InferenceServer:
    """HTTP front:  POST /predict  {"text": ..., "id"?, "features"?, "spatial"?}
    → {"probability", "prediction"};  POST /predict_batch {"instances": [...]};
    GET /healthz → stats."""

    def __init__(self, serving: ServingModel, host: str = "127.0.0.1",
                 port: int = 8000, linger_ms: float = 5.0,
                 request_timeout_s: float = 30.0,
                 busy_hold_ms: Optional[float] = None):
        self.batcher = _MicroBatcher(serving, linger_ms,
                                     busy_hold_ms=busy_hold_ms)
        batcher = self.batcher
        # per-request future deadline: must exceed the worst-case queue wait
        # (compiled-batch dispatch time × queued batches) or timed-out
        # clients retry into an already-backlogged queue and the server
        # never catches up
        timeout_s = float(request_timeout_s)

        class Handler(BaseHTTPRequestHandler):
            # keep-alive: clients reuse connections instead of paying a TCP
            # handshake per request (every _send sets Content-Length, which
            # HTTP/1.1 persistent connections require)
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"status": "ok", **batcher.stats,
                                     **batcher.latency_stats(),
                                     **batcher.phase_stats()})
                elif self.path == "/metrics":
                    # Prometheus text exposition format
                    stats = {**batcher.stats, **batcher.latency_stats(),
                             **batcher.phase_stats()}
                    lines = []
                    for k, v in stats.items():
                        name = f"mmc_serving_{k}"
                        kind = "counter" if k in ("requests", "batches") else "gauge"
                        lines += [f"# TYPE {name} {kind}", f"{name} {v}"]
                    body = ("\n".join(lines) + "\n").encode()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/plain; version=0.0.4; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(length) or b"{}")
                except Exception:
                    return self._send(400, {"error": "bad json"})
                try:
                    if self.path == "/predict":
                        return self._send(
                            200, batcher.submit(payload).result(timeout_s))
                    if self.path == "/predict_batch":
                        futs = [batcher.submit(i)
                                for i in payload.get("instances", [])]
                        return self._send(
                            200, [f.result(timeout_s) for f in futs])
                except Exception as e:
                    return self._send(500, {"error": str(e)})
                self._send(404, {"error": "not found"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self):
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def serve_forever(self):
        logger.info("serving on port %d", self.port)
        self.httpd.serve_forever()

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.batcher.close()
        if self._thread:
            self._thread.join(timeout=5)
