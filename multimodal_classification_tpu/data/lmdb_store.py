"""LMDB region-feature store: native C++ reader with Python fallback.

Replaces the reference's py-lmdb dependency and per-item pickle loop
(reference: pipelines/data_processing/lmdb_dataset.py:61-239). The native
reader (native/lmdb_reader.cc) mmaps the database and returns zero-copy
views; values are Facebook's pickled dicts with ``features`` [100, 2048] and
``boxes`` [100, 4] (pixel coords normalised by an assumed 1000×1000 image —
lmdb_dataset.py:181-208). Key probing mirrors the reference: ``id``,
``id.png``, zero-padded (lmdb_dataset.py:126-141).
"""

from __future__ import annotations

import ctypes
import logging
import os
import pickle
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

from multimodal_classification_tpu.data.features import FeatureStore
from multimodal_classification_tpu.data.lmdb_format import PythonLMDBReader

logger = logging.getLogger(__name__)

FIXED_NUM_REGIONS = 100  # fixed by Facebook's preprocessing (lmdb_dataset.py:70)
FIXED_FEATURE_DIM = 2048


def _native_dir() -> str:
    env = os.environ.get("MMC_TPU_NATIVE_DIR")
    if env:
        return env
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(os.path.dirname(os.path.dirname(here)), "native")


def build_native_reader(force: bool = False) -> Optional[str]:
    """Compile native/lmdb_reader.cc → native/build/liblmdb_reader.so.
    Returns the .so path, or None if no source/compiler available."""
    ndir = _native_dir()
    src = os.path.join(ndir, "lmdb_reader.cc")
    if not os.path.exists(src):
        return None
    out_dir = os.path.join(ndir, "build")
    os.makedirs(out_dir, exist_ok=True)
    so = os.path.join(out_dir, "liblmdb_reader.so")
    if not force and os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", so, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native LMDB reader build failed (%s); using python reader", e)
        return None
    return so


class NativeLMDBReader:
    """ctypes wrapper over the C++ reader (same API as PythonLMDBReader)."""

    def __init__(self, path: str, so_path: Optional[str] = None):
        so = so_path or build_native_reader()
        if so is None:
            raise RuntimeError("native reader unavailable")
        lib = ctypes.CDLL(so)
        lib.mmc_lmdb_open.restype = ctypes.c_void_p
        lib.mmc_lmdb_open.argtypes = [ctypes.c_char_p]
        lib.mmc_lmdb_close.argtypes = [ctypes.c_void_p]
        lib.mmc_lmdb_entries.restype = ctypes.c_long
        lib.mmc_lmdb_entries.argtypes = [ctypes.c_void_p]
        lib.mmc_lmdb_get.restype = ctypes.c_int
        lib.mmc_lmdb_get.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.mmc_lmdb_iter_start.argtypes = [ctypes.c_void_p]
        lib.mmc_lmdb_iter_next.restype = ctypes.c_int
        lib.mmc_lmdb_iter_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
        ]
        self._lib = lib
        self._env = lib.mmc_lmdb_open(path.encode())
        if not self._env:
            raise IOError(f"failed to open LMDB at {path}")
        self.entries = lib.mmc_lmdb_entries(self._env)

    def get(self, key: bytes) -> Optional[bytes]:
        val = ctypes.c_void_p()
        vlen = ctypes.c_size_t()
        rc = self._lib.mmc_lmdb_get(
            self._env, key, len(key), ctypes.byref(val), ctypes.byref(vlen)
        )
        if rc == 1:
            return ctypes.string_at(val.value, vlen.value)
        if rc < 0:
            raise IOError("corrupt or unsupported LMDB page")
        return None

    def items(self) -> Iterator[Tuple[bytes, bytes]]:
        self._lib.mmc_lmdb_iter_start(self._env)
        k = ctypes.c_void_p()
        klen = ctypes.c_size_t()
        v = ctypes.c_void_p()
        vlen = ctypes.c_size_t()
        while True:
            rc = self._lib.mmc_lmdb_iter_next(
                self._env, ctypes.byref(k), ctypes.byref(klen),
                ctypes.byref(v), ctypes.byref(vlen),
            )
            if rc == 0:
                return
            if rc < 0:
                raise IOError("corrupt or unsupported LMDB page")
            yield (
                ctypes.string_at(k.value, klen.value),
                ctypes.string_at(v.value, vlen.value),
            )

    def close(self):
        if getattr(self, "_env", None):
            self._lib.mmc_lmdb_close(self._env)
            self._env = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def open_lmdb(path: str, prefer_native: bool = True):
    if prefer_native:
        try:
            return NativeLMDBReader(path)
        except Exception as e:
            logger.warning("native LMDB reader unavailable (%s); python fallback", e)
    return PythonLMDBReader(path)


def process_boxes(boxes: Optional[np.ndarray]) -> np.ndarray:
    """Boxes → normalised (x1,y1,x2,y2,area) with the reference's assumed
    1000×1000 normalisation (lmdb_dataset.py:181-208)."""
    if boxes is None:
        return np.zeros((FIXED_NUM_REGIONS, 5), np.float32)
    boxes = np.asarray(boxes, np.float32)
    if boxes.ndim != 2 or boxes.shape[1] < 4:
        return np.zeros((FIXED_NUM_REGIONS, 5), np.float32)
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    area = (w * h) / 1_000_000.0
    return np.column_stack(
        [boxes[:, 0] / 1000.0, boxes[:, 1] / 1000.0,
         boxes[:, 2] / 1000.0, boxes[:, 3] / 1000.0, area]
    ).astype(np.float32)


class LMDBFeatureStore(FeatureStore):
    """id → (features [100,2048], spatial [100,5]) over detectron.lmdb."""

    num_regions = FIXED_NUM_REGIONS
    feature_dim = FIXED_FEATURE_DIM

    def __init__(self, lmdb_path: str, prefer_native: bool = True):
        self.reader = open_lmdb(lmdb_path, prefer_native)
        n = getattr(self.reader, "entries", None)
        logger.info("LMDB opened: %s entries", n)
        # probe actual region count/dim from the first entry (Facebook's file
        # is always 100×2048; fabricated/repacked stores may differ)
        for _k, raw in self.reader.items():
            try:
                obj = pickle.loads(raw)
                feats = obj.get("features") if isinstance(obj, dict) else obj
                if feats is not None:
                    arr = np.asarray(feats)
                    if arr.ndim == 2:
                        self.num_regions, self.feature_dim = int(arr.shape[0]), int(arr.shape[1])
            except Exception:
                pass
            break

    def _query(self, img_id: str) -> Optional[bytes]:
        for key in (img_id, f"{img_id}.png", img_id.zfill(5)):
            raw = self.reader.get(key.encode())
            if raw is not None:
                return raw
        return None

    def get(self, item_id: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        raw = self._query(str(item_id))
        if raw is None:
            return None
        obj = pickle.loads(raw)
        if isinstance(obj, dict):
            feats = obj.get("features", obj.get("feature", obj.get("fc6")))
            boxes = obj.get("boxes", obj.get("bbox"))
        else:
            feats, boxes = obj, None
        if feats is None:
            feats = np.zeros((FIXED_NUM_REGIONS, FIXED_FEATURE_DIM), np.float32)
        feats = np.asarray(feats, np.float32)
        return feats, process_boxes(boxes)

    def __contains__(self, item_id: str) -> bool:
        return self._query(str(item_id)) is not None


def write_feature_lmdb(path: str, ids, features, boxes):
    """Fabricate a detectron.lmdb-format database (tests / repacking):
    values are pickled {'features', 'boxes'} dicts keyed by id."""
    from multimodal_classification_tpu.data.lmdb_format import write_lmdb

    items = {}
    for i, item_id in enumerate(ids):
        items[str(item_id).encode()] = pickle.dumps(
            {"features": np.asarray(features[i], np.float32),
             "boxes": np.asarray(boxes[i], np.float32)},
            protocol=4,
        )
    write_lmdb(path, items)
