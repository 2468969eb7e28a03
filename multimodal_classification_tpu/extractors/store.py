"""Extractor-backed feature store: batched on-the-fly extraction + caching.

The reference extracts per image inside ``Dataset.__getitem__`` with an
in-RAM dict cache (nodes.py:129-148), costing a full Python/GPU round-trip
per image. Here: misses are computed through the **batched jitted** extractor
(``precompute`` runs whole id lists in device-sized batches), results live in
an in-memory cache and can be persisted to the HDF5 store layout for reuse
across runs (the reference's scripts/extract_features.py offline flow).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from multimodal_classification_tpu.data.features import (
    FeatureStore,
    HDF5FeatureStore,
    write_hdf5_features,
)
from multimodal_classification_tpu.extractors.base import load_image
from multimodal_classification_tpu.registry import get_feature_extractor

logger = logging.getLogger(__name__)


class ExtractorFeatureStore(FeatureStore):
    def __init__(
        self,
        extractor_name: str,
        image_root: str = ".",
        max_regions: int = 36,
        cache_path: Optional[str] = None,
        extractor_kwargs: Optional[dict] = None,
        batch_size: int = 8,
        seed: int = 0,
    ):
        kwargs = dict(extractor_kwargs or {})
        kwargs.setdefault("num_regions", max_regions)
        self.extractor = get_feature_extractor(extractor_name, **kwargs)
        self.num_regions = self.extractor.num_regions
        self.feature_dim = self.extractor.feature_dim
        self.image_root = image_root
        self.batch_size = batch_size
        self.params = self.extractor.init_params(jax.random.key(seed))
        if not getattr(self.extractor, "checkpoint", None):
            logger.warning(
                "extractor %s initialised with random weights (no checkpoint; "
                "offline environment)", extractor_name,
            )
        self._cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        self._disk: Optional[HDF5FeatureStore] = None
        self.cache_path = cache_path
        if cache_path and os.path.exists(cache_path):
            try:
                self._disk = HDF5FeatureStore(cache_path)
            except Exception as e:
                logger.warning("ignoring unreadable feature cache %s: %s", cache_path, e)

    # ------------------------------------------------------------------
    def _resolve_path(self, item_id: str, path: Optional[str]) -> Optional[str]:
        if path:
            cand = path if os.path.isabs(path) else os.path.join(self.image_root, path)
            if os.path.exists(cand):
                return cand
        for pattern in (f"img/{item_id}.png", f"img/{item_id}.jpg", f"{item_id}.png"):
            cand = os.path.join(self.image_root, pattern)
            if os.path.exists(cand):
                return cand
        return None

    def _compute_batch(self, paths: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        h, w = self.extractor.image_size
        imgs = []
        for p in paths:
            try:
                imgs.append(load_image(p, (h, w)))
            except Exception as e:
                # catch-log-continue per image, zeros fallback
                # (reference nodes.py:139-153)
                logger.warning("failed to load %s (%s); zeros", p, e)
                imgs.append(np.zeros((h, w, 3), np.float32))
        feats, spatial = self.extractor.extract_batch(self.params, np.stack(imgs))
        return np.asarray(feats), np.asarray(spatial)

    def precompute(
        self,
        ids: Sequence[str],
        paths: Optional[Sequence[Optional[str]]] = None,
        persist: bool = True,
    ) -> int:
        """Batched extraction for all resolvable ids; returns count computed."""
        paths = paths or [None] * len(ids)
        todo = []
        for item_id, path in zip(ids, paths):
            sid = str(item_id)
            if sid in self._cache or (self._disk and sid in self._disk):
                continue
            p = self._resolve_path(sid, path)
            if p:
                todo.append((sid, p))
        for start in range(0, len(todo), self.batch_size):
            chunk = todo[start : start + self.batch_size]
            # pad the final chunk to the jitted batch shape
            real = len(chunk)
            padded = chunk + [chunk[-1]] * (self.batch_size - real)
            feats, spatial = self._compute_batch([p for _i, p in padded])
            for k, (sid, _p) in enumerate(chunk):
                self._cache[sid] = (feats[k], spatial[k])
        if persist and self.cache_path and self._cache:
            all_ids = sorted(self._cache)
            write_hdf5_features(
                self.cache_path,
                all_ids,
                np.stack([self._cache[i][0] for i in all_ids]),
                np.stack([self._cache[i][1] for i in all_ids]),
            )
            self._disk = HDF5FeatureStore(self.cache_path)
        return len(todo)

    # ------------------------------------------------------------------
    def get(self, item_id: str, path: Optional[str] = None):
        sid = str(item_id)
        if sid in self._cache:
            return self._cache[sid]
        if self._disk is not None:
            got = self._disk.get(sid)
            if got is not None:
                return got
        p = self._resolve_path(sid, path)
        if p is None:
            return None
        feats, spatial = self._compute_batch([p])
        self._cache[sid] = (feats[0], spatial[0])
        return self._cache[sid]

    def __contains__(self, item_id: str) -> bool:
        sid = str(item_id)
        return sid in self._cache or (self._disk is not None and sid in self._disk) \
            or self._resolve_path(sid, None) is not None
