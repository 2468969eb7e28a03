"""Model export (serving/export.py): jax.export artifact round-trip.

The exported StableHLO programs + params.npz must reproduce the in-process
ServingModel bit-for-bit without touching the flax model code. No reference
counterpart (its deployment format is a torch state_dict pickle,
pipelines/model_training/nodes.py:953-964, unusable without the model class).
"""

import json
import os

import jax
import numpy as np
import pytest

from multimodal_classification_tpu.config import tiny_vilbert_config
from multimodal_classification_tpu.data import (
    DictFeatureStore,
    WordPieceTokenizer,
    build_test_vocab,
)
from multimodal_classification_tpu.models.vilbert import (
    ViLBERTForClassification,
    dummy_batch,
)
from multimodal_classification_tpu.serving import ServingModel, export_artifact, load_artifact
from multimodal_classification_tpu.serving.export import (
    _flatten_params,
    _unflatten_params,
)
from multimodal_classification_tpu.training.train import model_inputs


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = tiny_vilbert_config(dtype="float32", use_pallas_attention=False,
                              v_feature_size=32)
    model = ViLBERTForClassification(cfg)
    b = dummy_batch(cfg, 1, 12, 6)
    params = model.init(jax.random.key(0), **model_inputs(b))["params"]
    rng = np.random.default_rng(0)
    store = DictFeatureStore(
        {"42": rng.standard_normal((6, 32)).astype(np.float32)},
        {"42": rng.uniform(0, 1, (6, 5)).astype(np.float32)},
    )
    tok = WordPieceTokenizer(build_test_vocab())
    kw = dict(max_seq_length=12, num_regions=6, feature_dim=32, batch_size=4,
              seq_buckets=(8,))
    sm = ServingModel(model, params, tok, store, **kw)
    out = str(tmp_path_factory.mktemp("artifact"))
    manifest = export_artifact(model, params, out, **kw)
    return model, params, store, tok, sm, out, manifest


def test_manifest_contents(setup):
    *_, out, manifest = setup
    assert manifest["seq_buckets"] == [8]
    assert sorted(manifest["programs"]) == ["12", "8"]
    for fname in manifest["programs"].values():
        assert os.path.getsize(os.path.join(out, fname)) > 0
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f) == manifest


def test_flatten_roundtrip(setup):
    _, params, *_ = setup
    flat = _flatten_params(params)
    assert all("/" in k or isinstance(v, np.ndarray) for k, v in flat.items())
    rebuilt = _unflatten_params(flat)
    jax.tree.map(np.testing.assert_array_equal, params, rebuilt)


def test_exported_predict_parity(setup):
    model, params, store, tok, sm, out, _ = setup
    loaded = load_artifact(out, tok, store)
    texts = ["this is a hateful meme", "love"]
    insts = [{"id": "42"}, {"id": "missing"}]
    ref = sm.predict(texts, insts)
    got = loaded.predict(texts, insts)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
    # long text exercises the max-seq (12) program; short the 8 bucket
    long = ["a " * 20]
    np.testing.assert_allclose(loaded.predict(long), sm.predict(long),
                               rtol=1e-6, atol=1e-7)


def test_exported_int8_parity(setup, tmp_path):
    model, params, store, tok, *_ = setup
    kw = dict(max_seq_length=12, num_regions=6, feature_dim=32, batch_size=2,
              int8=True, int8_min_dim=8)
    sm8 = ServingModel(model, params, tok, store, **kw)
    out = str(tmp_path / "int8_artifact")
    export_artifact(model, params, out, **kw)
    loaded = load_artifact(out, tok, store)
    assert loaded.manifest["int8"] is True
    texts = ["hateful meme"]
    np.testing.assert_allclose(loaded.predict(texts, [{"id": "42"}]),
                               sm8.predict(texts, [{"id": "42"}]),
                               rtol=1e-6, atol=1e-7)


def test_exported_calibrated_int8_parity(setup, tmp_path):
    """ServingModel.calibrate switches to static activation scales; exporting
    the calibrated quant tree reproduces it bit-for-bit, and predictions stay
    rank-consistent with the float path."""
    model, params, store, tok, sm, *_ = setup
    kw = dict(max_seq_length=12, num_regions=6, feature_dim=32, batch_size=2,
              int8=True, int8_min_dim=8)
    sm8 = ServingModel(model, params, tok, store, **kw)
    texts = ["hateful meme", "love and peace"]
    insts = [{"id": "42"}, {"id": "42"}]
    sm8.calibrate(texts, insts)

    def has_ascale(t):
        return any(
            ("ascale" in v or has_ascale(v)) if isinstance(v, dict) else False
            for v in t.values()
        )

    assert has_ascale(sm8._quant)
    out = str(tmp_path / "calib_artifact")
    export_artifact(model, params, out, quant=sm8._quant, **kw)
    loaded = load_artifact(out, tok, store)
    ref = sm8.predict(texts, insts)
    np.testing.assert_allclose(loaded.predict(texts, insts), ref,
                               rtol=1e-6, atol=1e-7)
    # static-int8 predictions agree with the float server's argmax
    assert (ref.argmax(-1) == sm.predict(texts, insts).argmax(-1)).all()


def test_self_contained_artifact_and_checksum(setup, tmp_path):
    """Exports with vocab_path need NO tokenizer/store/config on the serving
    host; params.npz is integrity-checked against the manifest sha256."""
    model, params, store, tok, sm, *_ = setup
    vocab_file = tmp_path / "vocab.txt"
    from multimodal_classification_tpu.data import build_test_vocab

    v = build_test_vocab()
    vocab_file.write_text("\n".join(sorted(v, key=v.get)) + "\n")
    out = str(tmp_path / "selfcontained")
    kw = dict(max_seq_length=12, num_regions=6, feature_dim=32, batch_size=4,
              seq_buckets=(8,))
    manifest = export_artifact(model, params, out, vocab_path=str(vocab_file),
                               **kw)
    assert manifest["vocab"] == "vocab.txt" and manifest["params_sha256"]

    loaded = load_artifact(out)  # no tokenizer, no store
    texts = ["this is a hateful meme"]
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((6, 32)).astype(np.float32)
    spatial = rng.uniform(0, 1, (6, 5)).astype(np.float32)
    got = loaded.predict(texts, [{"features": feats, "spatial": spatial}])
    # reference server must use the SAME file-loaded tokenizer (the test
    # vocab's ids aren't contiguous, so the file round-trip renumbers them)
    from multimodal_classification_tpu.data import load_tokenizer

    sm_file = ServingModel(model, params, load_tokenizer(str(vocab_file), True),
                           None, **kw)
    ref = sm_file.predict(texts, [{"features": feats, "spatial": spatial}])
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)

    # corrupt one param leaf: load must refuse
    with np.load(os.path.join(out, "params.npz")) as z:
        flat = dict(z)
    k0 = sorted(flat)[0]
    flat[k0] = flat[k0] + 1.0
    np.savez(os.path.join(out, "params.npz"), **flat)
    with pytest.raises(ValueError, match="checksum"):
        load_artifact(out)


def test_batch_size_mismatch_rejected(setup):
    *_, tok_store_etc = setup
    model, params, store, tok, sm, out, _ = setup
    from multimodal_classification_tpu.serving import ExportedServingModel

    with pytest.raises(ValueError, match="exported at batch"):
        ExportedServingModel(out, tok, store, batch_size=16)


def test_http_server_over_artifact(setup):
    """The micro-batching HTTP server works unchanged over a loaded artifact."""
    import urllib.request

    from multimodal_classification_tpu.serving import InferenceServer

    model, params, store, tok, sm, out, _ = setup
    loaded = load_artifact(out, tok, store)
    server = InferenceServer(loaded, port=0, linger_ms=1.0)
    server.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/predict",
            data=json.dumps({"text": "a meme", "id": "42"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            resp = json.loads(r.read())
        assert set(resp) == {"probability", "prediction"}
        ref = sm.predict(["a meme"], [{"id": "42"}])
        np.testing.assert_allclose(resp["probability"], float(ref[0, 1]),
                                   rtol=1e-5)
    finally:
        server.stop()


def test_bf16_wire_signature_contract(tmp_path):
    """Regression guard for the round-3 wire-dtype change: for a bf16 model
    the exported programs' visual-feature input aval, the manifest's
    wire_dtype, the live ServingModel's wire dtype, and the reloaded
    artifact's wire dtype must ALL agree — a stale artifact exported before
    a wire-contract change must be impossible to miss."""
    from jax import export as jexport

    cfg = tiny_vilbert_config(dtype="bfloat16", use_pallas_attention=False,
                              v_feature_size=32)
    model = ViLBERTForClassification(cfg)
    b = dummy_batch(cfg, 1, 12, 6)
    params = model.init(jax.random.key(0), **model_inputs(b))["params"]
    rng = np.random.default_rng(0)
    store = DictFeatureStore(
        {"42": rng.standard_normal((6, 32)).astype(np.float32)},
        {"42": rng.uniform(0, 1, (6, 5)).astype(np.float32)},
    )
    tok = WordPieceTokenizer(build_test_vocab())
    kw = dict(max_seq_length=12, num_regions=6, feature_dim=32, batch_size=2,
              seq_buckets=(8,))
    sm = ServingModel(model, params, tok, store, **kw)
    out = str(tmp_path / "artifact_bf16")
    manifest = export_artifact(model, params, out, **kw)

    assert manifest["wire_dtype"] == "bfloat16"
    assert np.dtype(sm._wire_dtype) == np.dtype("bfloat16")

    # the serialized programs' input signature carries the bf16 feature aval
    import jax.numpy as jnp
    for fname in manifest["programs"].values():
        with open(os.path.join(out, fname), "rb") as f:
            exp = jexport.deserialize(bytearray(f.read()))
        feat_avals = [a for a in jax.tree_util.tree_leaves(exp.in_avals)
                      if a.ndim == 3 and a.shape[-1] == 32]
        assert feat_avals, "no visual-feature input aval found"
        for a in feat_avals:
            assert a.dtype == jnp.bfloat16, (fname, a)

    # and the reloaded artifact serves with the same wire dtype + parity
    loaded = load_artifact(out, tok, store)
    assert np.dtype(loaded._wire_dtype) == np.dtype("bfloat16")
    texts = ["this is a meme", "love"]
    insts = [{"id": "42"}, {"id": "42"}]
    np.testing.assert_allclose(loaded.predict(texts, insts),
                               sm.predict(texts, insts), rtol=1e-6, atol=1e-7)
