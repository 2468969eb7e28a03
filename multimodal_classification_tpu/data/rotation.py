"""Capacity-capped device-resident training: fixed shards rotated through a
double-buffered HBM window.

Why: `build_device_data` assumes the tensorised train set fits HBM next to
the model + optimizer state. Reference-scale fits easily (~3.5 GB bf16), but
a dataset past the chip's budget used to force the host-fed loader, which
this environment measured TRANSFER-BOUND (~17× slower, round 1). This module
is the training twin of serving's `preload_features(max_bytes=...)`: keep a
bounded window of fixed, equal-sized shards resident and rotate, with the
NEXT shard's upload issued before the current shard's steps so the transfer
overlaps compute (jax `device_put` is async; uploads ride the transfer
engine while the MXU runs the in-flight steps).

Input discipline: shard-then-shuffle — per epoch, visit shards in a
permuted order and draw permuted batches within each shard (the same
discipline as the dp-sharded path's `sharded_epoch_indices`). Each example
is seen at most once per epoch; each shard's remainder below one batch is
dropped (bounded by shards·(batch-1) per epoch vs batch-1 for the global
shuffle — the trade for locality). Shards are CONTIGUOUS fixed row ranges
of the tensorised arrays, so a rotating run's step on (shard s, local idx)
computes bit-for-bit what a full-resident step on (s·rows + idx) computes —
exactness-tested in tests/test_rotation.py.

Reference counterpart: the reference re-reads LMDB per item per epoch
(lmdb_dataset.py:210-239) — it streams everything, always; this streams
only when HBM cannot hold the set.
"""

from __future__ import annotations

import logging
from typing import Dict, Iterator, Optional, Tuple

import jax
import numpy as np

from multimodal_classification_tpu.data.device_cache import (
    DeviceData,
    tensorise_host,
)

logger = logging.getLogger(__name__)


def dataset_nbytes(fields: Dict[str, np.ndarray]) -> int:
    return sum(int(a.nbytes) for a in fields.values())


class RotatingDeviceData:
    """Host-tensorised dataset + a rotating device-resident shard window.

    ``max_bytes`` caps DEVICE residency. With double buffering (default) the
    cap pays for two shards (the training shard + the in-flight upload), so
    shard size is ``max_bytes // 2`` worth of rows.
    """

    def __init__(self, fields: Dict[str, np.ndarray], max_text_len: int,
                 max_bytes: int, double_buffer: bool = True,
                 batch_size: Optional[int] = None):
        self.fields, self.max_text_len = fields, max_text_len
        self.num_examples = int(self.fields["labels"].shape[0])
        row_bytes = dataset_nbytes(self.fields) / max(self.num_examples, 1)
        buffers = 2 if double_buffer else 1
        rows = int(max_bytes // (buffers * row_bytes))
        if rows < 1:
            raise ValueError(
                f"device_cache_max_bytes={max_bytes} below one example "
                f"({row_bytes:.0f} B/row × {buffers} buffers)")
        if batch_size:
            # a shard must hold at least one batch; align down so every
            # shard contributes whole batches
            if rows < batch_size:
                raise ValueError(
                    f"cap fits {rows} rows — smaller than one batch "
                    f"({batch_size}); raise device_cache_max_bytes")
            rows -= rows % batch_size
        self.shard_rows = min(rows, self.num_examples)
        self.num_shards = -(-self.num_examples // self.shard_rows)
        self.double_buffer = double_buffer and self.num_shards > 1
        logger.info(
            "rotating device cache: %d examples in %d shards of %d rows "
            "(%.0f MB/shard, cap %.0f MB, double_buffer=%s)",
            self.num_examples, self.num_shards, self.shard_rows,
            self.shard_rows * row_bytes / 1e6, max_bytes / 1e6,
            self.double_buffer)

    @classmethod
    def from_dataset(cls, ds, feature_dtype, max_bytes: int,
                     double_buffer: bool = True,
                     batch_size: Optional[int] = None) -> "RotatingDeviceData":
        fields, mtl = tensorise_host(ds, feature_dtype)
        return cls(fields, mtl, max_bytes, double_buffer=double_buffer,
                   batch_size=batch_size)

    def steps_per_epoch(self, batch_size: int) -> int:
        return sum(self.shard_real_rows(s) // batch_size
                   for s in range(self.num_shards))

    # ------------------------------------------------------------------
    def shard_real_rows(self, si: int) -> int:
        """Rows of shard ``si`` that are real examples (the final shard is
        padded up to the static shape by wrapping to row 0; padded rows are
        never indexed by the epoch schedule)."""
        base = si * self.shard_rows
        return min(self.shard_rows, self.num_examples - base)

    def _upload_shard(self, si: int) -> DeviceData:
        """Async device_put of shard ``si`` (static [shard_rows, ...] shapes;
        the tail shard wraps to the head rows for padding)."""
        base = si * self.shard_rows
        idx = (base + np.arange(self.shard_rows)) % self.num_examples

        def put(a):
            rows = a[base:base + self.shard_rows]
            if len(rows) < self.shard_rows:  # tail shard: wrap-pad
                rows = a[idx]
            return jax.device_put(rows)

        return DeviceData(
            **{k: put(v) for k, v in self.fields.items()},
            max_text_len=self.max_text_len,
        )

    def seq_bucket(self, multiple: int = 32) -> int:
        cap = self.fields["input_ids"].shape[1]
        return min(max(-(-self.max_text_len // multiple) * multiple, multiple),
                   cap)

    # ------------------------------------------------------------------
    def epoch_batches(
        self, batch_size: int, epoch: int, seed: int = 42,
        drop_last: bool = True,
    ) -> Iterator[Tuple[DeviceData, np.ndarray, np.ndarray]]:
        """Yield (resident_shard, local_indices [B], global_indices [B]).

        Shard visit order and within-shard batches are epoch-keyed
        permutations (deterministic, resume-compatible). With double
        buffering the next shard's upload is issued BEFORE the current
        shard's batches are yielded, so the transfer overlaps the dispatched
        train steps.
        """
        rng = np.random.default_rng((seed, epoch))
        order = rng.permutation(self.num_shards)
        pending: Optional[DeviceData] = None
        pending_si: Optional[int] = None
        for pos, si in enumerate(order):
            si = int(si)
            if pending_si == si:
                shard = pending
            else:
                shard = self._upload_shard(si)
            pending, pending_si = None, None
            if self.double_buffer and pos + 1 < len(order):
                nxt = int(order[pos + 1])
                pending, pending_si = self._upload_shard(nxt), nxt
            real = self.shard_real_rows(si)
            local = rng.permutation(real)
            end = real - (real % batch_size) if drop_last else real
            for start in range(0, end, batch_size):
                chunk = local[start:start + batch_size]
                if len(chunk) < batch_size:
                    chunk = np.concatenate(
                        [chunk, local[:batch_size - len(chunk)]])
                chunk = chunk.astype(np.int32)
                yield shard, chunk, si * self.shard_rows + chunk


def build_rotating_device_data(ds, feature_dtype, max_bytes: int,
                               batch_size: Optional[int] = None,
                               double_buffer: bool = True
                               ) -> RotatingDeviceData:
    return RotatingDeviceData.from_dataset(
        ds, feature_dtype, max_bytes, double_buffer=double_buffer,
        batch_size=batch_size)
