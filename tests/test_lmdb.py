"""LMDB format tests: python writer ↔ python reader ↔ native C++ reader
agreement, overflow pages, multi-level B+trees, and the feature store's
detectron.lmdb semantics."""

import pickle

import numpy as np
import pytest

from multimodal_classification_tpu.data.lmdb_format import (
    PythonLMDBReader,
    write_lmdb,
)
from multimodal_classification_tpu.data.lmdb_store import (
    LMDBFeatureStore,
    NativeLMDBReader,
    build_native_reader,
    process_boxes,
    write_feature_lmdb,
)


@pytest.fixture(scope="module")
def native_so():
    so = build_native_reader()
    if so is None:
        pytest.skip("no C++ compiler for native reader")
    return so


def _make_items(n, value_size=50, seed=0):
    rng = np.random.default_rng(seed)
    return {
        f"key{i:05d}".encode(): rng.bytes(value_size + int(rng.integers(0, 20)))
        for i in range(n)
    }


class TestFormatRoundtrip:
    @pytest.mark.parametrize(
        "n,vsize",
        [(5, 50), (500, 100), (50, 5000), (2000, 40)],  # small, multi-leaf, overflow, deep
    )
    def test_python_writer_python_reader(self, tmp_path, n, vsize):
        items = _make_items(n, vsize)
        path = str(tmp_path / "test.mdb")
        write_lmdb(path, items)
        r = PythonLMDBReader(path)
        assert r.entries == n
        for k, v in items.items():
            assert r.get(k) == v, k
        assert r.get(b"missing") is None
        got = dict(r.items())
        assert got == items

    @pytest.mark.parametrize("n,vsize", [(5, 50), (500, 100), (50, 5000), (2000, 40)])
    def test_native_reader_agrees(self, tmp_path, native_so, n, vsize):
        items = _make_items(n, vsize)
        path = str(tmp_path / "test.mdb")
        write_lmdb(path, items)
        r = NativeLMDBReader(path, native_so)
        assert r.entries == n
        for k, v in items.items():
            assert r.get(k) == v, k
        assert r.get(b"missing") is None
        assert dict(r.items()) == items
        r.close()

    def test_large_values_span_overflow_pages(self, tmp_path, native_so):
        """~800KB values like Facebook's real pickled features."""
        rng = np.random.default_rng(1)
        items = {b"a": rng.bytes(820_000), b"b": rng.bytes(820_000)}
        path = str(tmp_path / "big.mdb")
        write_lmdb(path, items)
        for reader in (PythonLMDBReader(path), NativeLMDBReader(path, native_so)):
            assert reader.get(b"a") == items[b"a"]
            assert reader.get(b"b") == items[b"b"]

    def test_empty_db(self, tmp_path):
        path = str(tmp_path / "empty.mdb")
        write_lmdb(path, {})
        r = PythonLMDBReader(path)
        assert r.entries == 0
        assert r.get(b"x") is None
        assert list(r.items()) == []

    def test_directory_path_resolves_data_mdb(self, tmp_path, native_so):
        d = tmp_path / "env"
        d.mkdir()
        write_lmdb(str(d / "data.mdb"), {b"k": b"v"})
        assert NativeLMDBReader(str(d), native_so).get(b"k") == b"v"
        assert PythonLMDBReader(str(d)).get(b"k") == b"v"


class TestFeatureStore:
    def test_detectron_format_and_key_probing(self, tmp_path):
        rng = np.random.default_rng(0)
        ids = ["1234", "56789"]
        feats = rng.standard_normal((2, 100, 2048)).astype(np.float32)
        boxes = rng.uniform(0, 1000, (2, 100, 4)).astype(np.float32)
        boxes[..., 2:] = np.maximum(boxes[..., 2:], boxes[..., :2] + 1)
        path = str(tmp_path / "detectron.lmdb")
        write_feature_lmdb(path, ids, feats, boxes)

        store = LMDBFeatureStore(path, prefer_native=False)
        f, s = store.get("1234")
        np.testing.assert_array_equal(f, feats[0])
        assert s.shape == (100, 5)
        np.testing.assert_allclose(s[:, 0], boxes[0, :, 0] / 1000.0, rtol=1e-6)
        np.testing.assert_allclose(
            s[:, 4],
            (boxes[0, :, 2] - boxes[0, :, 0]) * (boxes[0, :, 3] - boxes[0, :, 1]) / 1e6,
            rtol=1e-5,
        )
        assert store.get("nope") is None
        assert "56789" in store

    def test_png_suffixed_and_zero_padded_keys(self, tmp_path):
        """The reference probes id, id.png, id.zfill(5) (lmdb_dataset.py:126-141)."""
        from multimodal_classification_tpu.data.lmdb_format import write_lmdb

        blob = pickle.dumps({"features": np.ones((4, 8), np.float32)})
        path = str(tmp_path / "k.mdb")
        write_lmdb(path, {b"777.png": blob, b"00042": blob})
        store = LMDBFeatureStore(path, prefer_native=False)
        assert store.get("777") is not None
        assert store.get("42") is not None

    def test_process_boxes_edge_cases(self):
        assert process_boxes(None).shape == (100, 5)
        assert process_boxes(np.zeros((3,))).shape == (100, 5)
