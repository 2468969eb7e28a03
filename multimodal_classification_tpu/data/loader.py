"""Host batching + async prefetch pipeline.

The reference feeds the GPU with a synchronous, single-threaded per-item
DataLoader (num_workers=0 everywhere — nodes.py:405, lmdb_dataset.py:258) and
re-tokenizes text in every ``__getitem__``. TPU-first redesign:

- all text is tokenized **once** up front (vectorised WordPiece);
- examples are assembled into fixed-shape numpy batches on host threads;
- a background producer keeps a bounded queue of ready batches so device
  steps never wait on the host (double-buffering; the ``device_put`` overlap
  happens in the Trainer via donated jit steps);
- the final partial batch is **padded** (with a 0/1 ``weights`` vector)
  instead of shape-specialised — XLA recompiles per shape, so every batch
  must look identical.

Deterministic shuffling: permutation seeded by (seed, epoch) — reproducible
like the reference's seeded splits (SURVEY.md §7.3).
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Dict, Iterator, Mapping, Optional

import numpy as np
import pandas as pd

from multimodal_classification_tpu.data.features import FeatureStore
from multimodal_classification_tpu.data.tokenizer import WordPieceTokenizer

logger = logging.getLogger(__name__)


class MemesDataset:
    """Tokenized Hateful-Memes examples over a feature store.

    Mirrors the reference HatefulMemesDataset contract (nodes.py:86-206):
    item = tokenized text (max_seq_length) + region features padded/truncated
    to max_regions + all-ones visual mask over real regions + label.
    Missing features fall back to zeros (reference nodes.py:150-153).
    """

    def __init__(
        self,
        df: pd.DataFrame,
        tokenizer: WordPieceTokenizer,
        feature_store: Optional[FeatureStore],
        max_seq_length: int = 128,
        max_regions: int = 36,
        feature_dim: int = 2048,
        text_column: str = "text_clean",
    ):
        self.df = df.reset_index(drop=True)
        self.store = feature_store
        self.max_regions = max_regions
        self.feature_dim = feature_dim
        texts = (
            self.df[text_column] if text_column in self.df.columns else self.df["text"]
        ).fillna("").tolist()
        self.input_ids, self.attention_mask, self.token_type_ids = tokenizer.encode_batch(
            texts, max_seq_length
        )
        if "label" in self.df.columns:
            self.labels = self.df["label"].fillna(-1).astype(np.int32).to_numpy()
        else:
            self.labels = np.full(len(self.df), -1, np.int32)
        self.ids = self.df["id"].astype(str).tolist()
        self._missing = 0

    def __len__(self) -> int:
        return len(self.df)

    def _features(self, i: int):
        if self.store is not None:
            got = self.store.get(self.ids[i])
            if got is not None:
                return got
            self._missing += 1
            if self._missing <= 5:
                logger.warning("no features for id=%s; using zeros", self.ids[i])
        return (
            np.zeros((self.max_regions, self.feature_dim), np.float32),
            np.zeros((self.max_regions, 5), np.float32),
        )

    def get(self, i: int) -> Dict[str, np.ndarray]:
        feats, spatial = self._features(i)
        n = min(feats.shape[0], self.max_regions)
        f = np.zeros((self.max_regions, self.feature_dim), np.float32)
        s = np.zeros((self.max_regions, 5), np.float32)
        m = np.zeros(self.max_regions, np.float32)
        f[:n] = feats[:n]
        s[:n] = spatial[:n]
        m[:n] = 1.0
        return {
            "input_ids": self.input_ids[i],
            "attention_mask": self.attention_mask[i],
            "token_type_ids": self.token_type_ids[i],
            "visual_features": f,
            "visual_attention_mask": m,
            "spatial_locations": s,
            "labels": self.labels[i],
        }


class BatchLoader:
    """Iterable over fixed-shape batches with background prefetch.

    Calling the loader (``loader()``) returns a fresh iterator and advances
    the shuffle epoch — matching the Trainer's ``train_data()`` contract.
    """

    def __init__(
        self,
        dataset: MemesDataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 42,
        drop_last: bool = False,
        prefetch: int = 2,
        wire_dtype: Optional[str] = None,
        text_bucket_multiple: int = 0,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0
        # text-length bucket (see data/device_cache.py DeviceData.gather):
        # slice the text axis to the dataset's real max token length rounded
        # up — identical masked-attention function, fewer padding FLOPs/bytes
        self._seq_bucket = None
        if text_bucket_multiple:
            max_len = int(dataset.attention_mask.sum(-1).max())
            b = -(-max_len // text_bucket_multiple) * text_bucket_multiple
            if b < dataset.input_ids.shape[1]:
                self._seq_bucket = max(b, text_bucket_multiple)
        # dense float fields cross the host→device link in this dtype;
        # "bfloat16" halves transfer bytes and matches the model's compute
        # dtype (no quality change relative to bf16 matmuls)
        self._wire_dtype = None
        if wire_dtype and wire_dtype != "float32":
            import ml_dtypes

            self._wire_dtype = np.dtype(ml_dtypes.bfloat16) if wire_dtype == "bfloat16" \
                else np.dtype(wire_dtype)

    def __len__(self) -> int:
        n = len(self.ds)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self._epoch))
            rng.shuffle(idx)
        return idx

    def _make_batch(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        n_real = len(indices)
        bs = self.batch_size
        examples = [self.ds.get(int(i)) for i in indices]
        batch = {
            k: np.stack([e[k] for e in examples]) for k in examples[0]
        }
        if n_real < bs:  # pad final batch to static shape
            pad = bs - n_real
            for k, v in batch.items():
                batch[k] = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
        w = np.zeros(bs, np.float32)
        w[:n_real] = 1.0
        batch["weights"] = w
        if self._seq_bucket is not None:
            for k in ("input_ids", "attention_mask", "token_type_ids"):
                batch[k] = batch[k][:, : self._seq_bucket]
        if self._wire_dtype is not None:
            for k in ("visual_features", "spatial_locations", "attention_mask",
                      "visual_attention_mask"):
                batch[k] = batch[k].astype(self._wire_dtype)
        return batch

    def _produce(self, order: np.ndarray, out: "queue.Queue"):
        try:
            for start in range(0, len(order), self.batch_size):
                chunk = order[start : start + self.batch_size]
                if len(chunk) < self.batch_size and self.drop_last:
                    break
                out.put(self._make_batch(chunk))
        except Exception as e:  # surface producer errors to the consumer
            out.put(e)
        finally:
            out.put(None)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        self._epoch += 1
        q: "queue.Queue" = queue.Queue(maxsize=max(self.prefetch, 1))
        t = threading.Thread(target=self._produce, args=(order, q), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            yield item

    def __call__(self, epoch: Optional[int] = None):
        """Fresh iterator. With ``epoch`` the shuffle is keyed on it (the
        Trainer passes the epoch so a resumed run replays the exact order);
        without, the loader's internal counter advances as before."""
        if epoch is not None:
            self._epoch = int(epoch)
        return iter(self)


def make_loaders(
    datasets: Mapping[str, MemesDataset],
    batch_size: int,
    seed: int = 42,
    prefetch: int = 2,
) -> Dict[str, BatchLoader]:
    """train (shuffled) / val / test loaders — the reference's
    create_*_dataloaders triple (e.g. lmdb_dataset.py:249-319)."""
    out = {}
    for name, ds in datasets.items():
        out[name] = BatchLoader(
            ds, batch_size, shuffle=(name == "train"), seed=seed, prefetch=prefetch
        )
    return out
