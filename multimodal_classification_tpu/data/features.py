"""Precomputed region-feature stores (HDF5 + in-memory).

HDF5 layout matches the reference's self-extracted store
(reference: pipelines/data_processing/precomputed_dataset.py:21-131 and
scripts/extract_features.py): datasets ``visual_features`` [N, R, 2048] and
``spatial_features`` [N, R, 5] plus an id→index map. The reference forced
``num_workers=0`` because h5py handles don't fork; here handles are opened
lazily per-thread (threads share one handle safely under h5py's global lock).
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, Optional, Tuple

import numpy as np


class FeatureStore:
    """Abstract id → (features [R,2048], spatial [R,5]) store."""

    num_regions: int
    feature_dim: int

    def get(self, item_id: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        raise NotImplementedError

    def __contains__(self, item_id: str) -> bool:
        raise NotImplementedError


class HDF5FeatureStore(FeatureStore):
    def __init__(self, h5_path: str, id_map_path: Optional[str] = None):
        import h5py  # lazy

        self.h5_path = h5_path
        self._local = threading.local()
        if id_map_path is None:
            for cand in (h5_path + ".ids.json", os.path.splitext(h5_path)[0] + "_ids.npy"):
                if os.path.exists(cand):
                    id_map_path = cand
                    break
        if id_map_path is None:
            raise FileNotFoundError(f"no id map next to {h5_path}")
        if id_map_path.endswith(".json"):
            with open(id_map_path) as f:
                ids = json.load(f)
        else:
            ids = np.load(id_map_path, allow_pickle=True).tolist()
        self.id_to_idx: Dict[str, int] = {str(k): i for i, k in enumerate(ids)}
        with h5py.File(h5_path, "r") as f:
            shape = f["visual_features"].shape
        self.num_regions, self.feature_dim = int(shape[1]), int(shape[2])

    def _file(self):
        import h5py

        if not hasattr(self._local, "f"):
            self._local.f = h5py.File(self.h5_path, "r")
        return self._local.f

    def get(self, item_id: str):
        idx = self.id_to_idx.get(str(item_id))
        if idx is None:
            return None
        f = self._file()
        return (
            np.asarray(f["visual_features"][idx], np.float32),
            np.asarray(f["spatial_features"][idx], np.float32),
        )

    def __contains__(self, item_id: str) -> bool:
        return str(item_id) in self.id_to_idx


class DictFeatureStore(FeatureStore):
    """In-memory store (tests, small runs, extractor output caching)."""

    def __init__(self, feats: Dict[str, np.ndarray], spatial: Dict[str, np.ndarray]):
        self.feats = {str(k): v for k, v in feats.items()}
        self.spatial = {str(k): v for k, v in spatial.items()}
        any_feat = next(iter(self.feats.values()))
        self.num_regions, self.feature_dim = any_feat.shape

    def get(self, item_id: str):
        f = self.feats.get(str(item_id))
        if f is None:
            return None
        return np.asarray(f, np.float32), np.asarray(self.spatial[str(item_id)], np.float32)

    def __contains__(self, item_id: str) -> bool:
        return str(item_id) in self.feats


def write_hdf5_features(
    path: str,
    ids,
    features: np.ndarray,
    spatial: np.ndarray,
):
    """Write a store in the reference layout (+ json id map). Used by the
    offline precompute pipeline and test fixtures."""
    import h5py

    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("visual_features", data=np.asarray(features, np.float32))
        f.create_dataset("spatial_features", data=np.asarray(spatial, np.float32))
    with open(path + ".ids.json", "w") as f:
        json.dump([str(i) for i in ids], f)
