"""Data layer tests: tokenizer (vs HF slow-tokenizer semantics implemented in
torch-free python), ingest/splits, feature stores, batch loader shapes/
determinism/padding."""

import numpy as np
import pytest

from multimodal_classification_tpu.data import (
    BatchLoader,
    DictFeatureStore,
    HDF5FeatureStore,
    MemesDataset,
    WordPieceTokenizer,
    build_test_vocab,
    compute_dataset_statistics,
    load_hateful_memes,
    preprocess_data,
    write_hdf5_features,
)
from tests.fixtures import make_dataset_dir, make_feature_arrays, make_memes_df


class TestTokenizer:
    @pytest.fixture
    def tok(self):
        return WordPieceTokenizer(build_test_vocab())

    def test_wordpiece_greedy_longest_match(self, tok):
        assert tok.tokenize("hateful") == ["hateful"]
        assert tok.tokenize("hates") == ["hate", "##s"]
        assert tok.tokenize("loved") == ["love", "##d"]

    def test_basic_tokenize_punct_lower(self, tok):
        assert tok.basic_tokenize("Hate, People!") == ["hate", ",", "people", "!"]

    def test_unknown_falls_to_unk(self, tok):
        # 'ß' not in vocab and not decomposable → [UNK]
        assert tok.tokenize("ß") == ["[UNK]"]

    def test_encode_shape_and_special_tokens(self, tok):
        ids, mask, types = tok.encode("the meme is hateful", max_length=16)
        assert ids.shape == (16,) and mask.shape == (16,) and types.shape == (16,)
        assert ids[0] == tok.cls_id
        n = int(mask.sum())
        assert ids[n - 1] == tok.sep_id
        assert (ids[n:] == tok.pad_id).all()

    def test_truncation(self, tok):
        long_text = "meme " * 100
        ids, mask, _ = tok.encode(long_text, max_length=8)
        assert int(mask.sum()) == 8
        assert ids[-1] == tok.sep_id

    def test_matches_hf_bert_tokenizer_semantics(self, tok):
        """Cross-check against HF's WordpieceTokenizer run on the same vocab
        (pure-python, offline)."""
        from transformers.models.bert.tokenization_bert import (
            BasicTokenizer,
            WordpieceTokenizer,
        )

        basic = BasicTokenizer(do_lower_case=True)
        wp = WordpieceTokenizer(vocab=tok.vocab, unk_token="[UNK]")
        for text in [
            "The Meme IS hateful!",
            "people, hate. love?",
            "abc xyz 123",
            "hates loved hating",
        ]:
            want = [p for w in basic.tokenize(text) for p in wp.tokenize(w)]
            assert tok.tokenize(text) == want, text


class TestIngest:
    def test_load_splits_and_dedup(self, tmp_path):
        d, dfs = make_dataset_dir(tmp_path)
        splits = load_hateful_memes(d)
        assert len(splits["train"]) == 64
        assert len(splits["val"]) == 32
        assert len(splits["test"]) == 32
        assert not set(splits["train"]["id"]) & set(splits["val"]["id"])

    def test_carveout_split_stratified(self, tmp_path):
        d, _ = make_dataset_dir(tmp_path, n_train=200)
        splits = load_hateful_memes(d, use_dev_as_val=False, val_split_ratio=0.1)
        n = len(splits["train"]) + len(splits["val"])
        assert abs(len(splits["val"]) - 0.1 * n) <= 2
        # same seed → same split
        splits2 = load_hateful_memes(d, use_dev_as_val=False, val_split_ratio=0.1)
        assert splits["val"]["id"].tolist() == splits2["val"]["id"].tolist()

    def test_preprocess_and_stats(self):
        df = make_memes_df(50)
        df = preprocess_data(df, {"lowercase": True, "max_text_length": 512})
        assert "text_clean" in df
        stats = compute_dataset_statistics({"train": df})
        assert stats["train"]["num_samples"] == 50
        assert 0.0 <= stats["train"]["hateful_ratio"] <= 1.0


class TestFeatureStores:
    def test_hdf5_roundtrip(self, tmp_path):
        ids = [str(i) for i in range(10)]
        feats, spatial = make_feature_arrays(ids, num_regions=7, dim=32)
        path = str(tmp_path / "feats.h5")
        write_hdf5_features(path, ids, feats, spatial)
        store = HDF5FeatureStore(path)
        assert store.num_regions == 7 and store.feature_dim == 32
        f, s = store.get("3")
        np.testing.assert_array_equal(f, feats[3])
        np.testing.assert_array_equal(s, spatial[3])
        assert store.get("99") is None

    def test_dict_store(self):
        ids = ["a", "b"]
        feats, spatial = make_feature_arrays(ids, 4, 16)
        store = DictFeatureStore(
            {i: feats[k] for k, i in enumerate(ids)},
            {i: spatial[k] for k, i in enumerate(ids)},
        )
        assert "a" in store and "z" not in store


class TestBatchLoader:
    @pytest.fixture
    def dataset(self):
        df = make_memes_df(37)
        df = preprocess_data(df, {"lowercase": True})
        ids = df["id"].tolist()
        feats, spatial = make_feature_arrays(ids, num_regions=9, dim=64)
        store = DictFeatureStore(
            {i: feats[k] for k, i in enumerate(ids)},
            {i: spatial[k] for k, i in enumerate(ids)},
        )
        tok = WordPieceTokenizer(build_test_vocab())
        return MemesDataset(df, tok, store, max_seq_length=24, max_regions=12, feature_dim=64)

    def test_item_shapes_and_region_padding(self, dataset):
        item = dataset.get(0)
        assert item["visual_features"].shape == (12, 64)
        assert item["visual_attention_mask"].sum() == 9  # 9 real regions of 12
        assert item["spatial_locations"].shape == (12, 5)

    def test_batches_fixed_shape_with_padded_final(self, dataset):
        loader = BatchLoader(dataset, batch_size=16)
        batches = list(loader)
        assert len(batches) == 3  # 37 → 16+16+5
        for b in batches:
            assert b["input_ids"].shape == (16, 24)
            assert b["visual_features"].shape == (16, 12, 64)
        assert batches[-1]["weights"].sum() == 5

    def test_shuffle_is_per_epoch_deterministic(self, dataset):
        l1 = BatchLoader(dataset, batch_size=8, shuffle=True, seed=7)
        l2 = BatchLoader(dataset, batch_size=8, shuffle=True, seed=7)
        e1a = [b["labels"].tolist() for b in l1]
        e1b = [b["labels"].tolist() for b in l2]
        assert e1a == e1b  # same seed+epoch → identical
        e2a = [b["labels"].tolist() for b in l1]
        assert e2a != e1a  # next epoch reshuffles

    def test_missing_features_fall_back_to_zeros(self):
        df = make_memes_df(4)
        tok = WordPieceTokenizer(build_test_vocab())
        ds = MemesDataset(df, tok, feature_store=None, max_seq_length=16,
                          max_regions=6, feature_dim=32)
        item = ds.get(0)
        assert (item["visual_features"] == 0).all()

    def test_wire_dtype_bf16(self, dataset):
        import ml_dtypes

        loader = BatchLoader(dataset, batch_size=8, wire_dtype="bfloat16")
        b = next(iter(loader))
        assert b["visual_features"].dtype == ml_dtypes.bfloat16
        assert b["input_ids"].dtype == np.int32  # ints untouched
        assert b["labels"].dtype == np.int32

    def test_producer_exception_propagates(self, dataset):
        loader = BatchLoader(dataset, batch_size=8)
        orig = dataset.get
        dataset.get = lambda i: (_ for _ in ()).throw(RuntimeError("boom"))
        with pytest.raises(RuntimeError, match="boom"):
            list(loader)
        dataset.get = orig


class TestNativeTokenizer:
    """C++ WordPiece kernel (native/wordpiece_tokenizer.cc) must be
    observably identical to the Python tokenizer on all inputs."""

    @pytest.fixture(scope="class")
    def pair(self):
        from multimodal_classification_tpu.data.tokenizer_native import (
            NativeWordPieceTokenizer,
            build_native_tokenizer,
        )

        if build_native_tokenizer() is None:
            pytest.skip("no C++ toolchain")
        vocab = build_test_vocab()
        return NativeWordPieceTokenizer(vocab), WordPieceTokenizer(vocab)

    CASES = [
        "the meme is hateful",
        "Hate, People!  LOVED??",
        "",
        "   \t\n  ",
        "a" * 150 + " short",          # >max_chars_per_word → UNK
        "x" * 99,                       # greedy multi-piece
        "don't stop; it's a meme...",
        "meme " * 100,                  # truncation
        "café naïve résumé",  # non-ASCII → python fallback
        "emoji \U0001f600 mixed ascii",
        "\x00\x01control\x02chars\x7f",
        "tab\tsep\nnewline\rreturn",
    ]

    @pytest.mark.parametrize("max_length", [8, 32, 128])
    def test_encode_batch_parity(self, pair, max_length):
        native, py = pair
        n_ids, n_mask, n_typ = native.encode_batch(self.CASES, max_length)
        p_ids, p_mask, p_typ = py.encode_batch(self.CASES, max_length)
        np.testing.assert_array_equal(n_ids, p_ids)
        np.testing.assert_array_equal(n_mask, p_mask)
        np.testing.assert_array_equal(n_typ, p_typ)

    def test_encode_parity_fuzz(self, pair):
        native, py = pair
        rng = np.random.default_rng(0)
        alphabet = list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
                        "0123456789 .,!?';:#@$%^&*()[]{}-_=+\t")
        texts = [
            "".join(rng.choice(alphabet, rng.integers(0, 60)))
            for _ in range(200)
        ]
        n_ids, n_mask, _ = native.encode_batch(texts, 48)
        p_ids, p_mask, _ = py.encode_batch(texts, 48)
        np.testing.assert_array_equal(n_ids, p_ids)
        np.testing.assert_array_equal(n_mask, p_mask)

    def test_single_encode_and_attrs(self, pair):
        native, py = pair
        assert (native.cls_id, native.sep_id, native.pad_id, native.unk_id) == (
            py.cls_id, py.sep_id, py.pad_id, py.unk_id)
        i1, m1, t1 = native.encode("people hates memes!", 16)
        i2, m2, t2 = py.encode("people hates memes!", 16)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(m1, m2)

    def test_load_tokenizer_returns_native(self, tmp_path):
        from multimodal_classification_tpu.data.tokenizer import load_tokenizer
        from multimodal_classification_tpu.data.tokenizer_native import (
            NativeWordPieceTokenizer,
            build_native_tokenizer,
        )

        vocab = build_test_vocab()
        path = tmp_path / "vocab.txt"
        inv = {i: t for t, i in vocab.items()}
        path.write_text(
            "\n".join(inv.get(i, f"[unused{i}]") for i in range(max(inv) + 1)) + "\n"
        )
        tok = load_tokenizer(str(path))
        if build_native_tokenizer() is not None:
            assert isinstance(tok, NativeWordPieceTokenizer)
        ids, mask, _ = tok.encode("the meme", 8)
        assert ids[0] == tok.cls_id and int(mask.sum()) == 4


class TestImageAcquisition:
    """Offline exercise of the GDrive-tarball + per-image-HTTP-fallback flow
    (reference data_processing/nodes.py:111-167) with fabricated archives and
    an in-memory fetcher."""

    @staticmethod
    def _make_tarball(path, names, payload=b"\x89PNG fake"):
        import io
        import tarfile

        with tarfile.open(path, "w:gz") as tar:
            for name in names:
                info = tarfile.TarInfo(name)
                info.size = len(payload)
                tar.addfile(info, io.BytesIO(payload))

    def test_extract_plus_fallback_plus_wiring(self, tmp_path):
        import shutil

        from multimodal_classification_tpu.data.images import acquire_images
        from multimodal_classification_tpu.data.memes import attach_image_paths
        import pandas as pd

        src = tmp_path / "remote.tar.gz"
        self._make_tarball(src, ["img/00001.png", "img/00002.png"])
        data_dir = tmp_path / "raw"
        fetched_urls = []

        def fake_download(url, dest):
            shutil.copy(src, dest)

        def fake_fetch(url):
            fetched_urls.append(url)
            return b"fetched-bytes"

        names = ["img/00001.png", "img/00002.png", "img/00003.png"]
        stats = acquire_images(str(data_dir), names,
                               download_archive=fake_download, fetch=fake_fetch)
        assert stats == {"extracted": 2, "fetched": 1, "missing": 0,
                         "skipped_archive": False}
        assert fetched_urls == [
            "https://huggingface.co/datasets/limjiayi/hateful_memes_expanded"
            "/resolve/main/img/00003.png"]
        for n in names:
            assert (data_dir / n).exists()
        assert (data_dir / "img/00003.png").read_bytes() == b"fetched-bytes"

        # img_path wiring: the acquired relative names resolve to real files
        df = attach_image_paths(pd.DataFrame({"id": [1, 2, 3], "img": names}),
                                str(data_dir))
        assert df["img_path"].map(lambda p: __import__("os").path.exists(p)).all()

    def test_archive_download_failure_falls_back_per_image(self, tmp_path):
        from multimodal_classification_tpu.data.images import acquire_images

        def failing_download(url, dest):
            raise OSError("no gdown / no network")

        stats = acquire_images(
            str(tmp_path), ["img/a.png", "img/b.png"],
            download_archive=failing_download,
            fetch=lambda url: b"x")
        assert stats["extracted"] == 0 and stats["fetched"] == 2
        assert stats["missing"] == 0

    def test_fetch_failure_counts_missing_not_raises(self, tmp_path):
        from multimodal_classification_tpu.data.images import acquire_images

        def failing(url, dest=None):
            raise OSError("offline")

        stats = acquire_images(str(tmp_path), ["img/a.png"],
                               download_archive=failing, fetch=failing)
        assert stats == {"extracted": 0, "fetched": 0, "missing": 1,
                         "skipped_archive": False}

    def test_skips_archive_when_images_present(self, tmp_path):
        from multimodal_classification_tpu.data.images import acquire_images

        img_dir = tmp_path / "img"
        img_dir.mkdir()
        for i in range(5):
            (img_dir / f"{i}.png").write_bytes(b"x")

        def must_not_call(url, dest):
            raise AssertionError("archive download should be skipped")

        stats = acquire_images(str(tmp_path), [f"img/{i}.png" for i in range(5)],
                               download_archive=must_not_call,
                               fetch=must_not_call,
                               skip_archive_threshold=3)
        assert stats["skipped_archive"] and stats["fetched"] == 0

    def test_tar_traversal_rejected(self, tmp_path):
        import io
        import tarfile

        import pytest as _pytest

        from multimodal_classification_tpu.data.images import safe_extract_tar

        evil = tmp_path / "evil.tar.gz"
        with tarfile.open(evil, "w:gz") as tar:
            info = tarfile.TarInfo("../escape.png")
            info.size = 1
            tar.addfile(info, io.BytesIO(b"x"))
        dest = tmp_path / "out"
        dest.mkdir()
        with _pytest.raises(ValueError, match="unsafe tar member"):
            safe_extract_tar(str(evil), str(dest))
        assert not (tmp_path / "escape.png").exists()
