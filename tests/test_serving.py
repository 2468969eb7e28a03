"""Online serving runtime (serving/server.py): fixed-shape batched predictor
parity with the raw eval step, micro-batching over HTTP, zero-feature
fallback for unknown ids. No reference counterpart (its closest surface is
the offline run_inference node, nodes.py:967-1009)."""

import json
import threading
import urllib.request

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
from multimodal_classification_tpu.serving import InferenceServer, ServingModel
from multimodal_classification_tpu.training.train import make_eval_step, model_inputs


@pytest.fixture(scope="module")
def serving():
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
    sm = ServingModel(model, params, tok, store, max_seq_length=12,
                      num_regions=6, feature_dim=32, batch_size=4)
    return cfg, model, params, store, tok, sm


def test_predict_matches_raw_eval_step(serving):
    cfg, model, params, store, tok, sm = serving
    probs = sm.predict(["this is a hateful meme", "love"],
                       [{"id": "42"}, {"id": "42"}])
    assert probs.shape == (2, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)

    # reproduce by hand through the plain eval step
    ids, mask, types = tok.encode_batch(
        ["this is a hateful meme", "love"], 12)
    feats, spatial = store.get("42")
    batch = {
        "input_ids": np.pad(ids, ((0, 2), (0, 0))),
        "attention_mask": np.pad(mask, ((0, 2), (0, 0))),
        "token_type_ids": np.pad(types, ((0, 2), (0, 0))),
        "visual_features": np.pad(
            np.stack([feats, feats]), ((0, 2), (0, 0), (0, 0))),
        "visual_attention_mask": np.pad(np.ones((2, 6), np.float32), ((0, 2), (0, 0))),
        "spatial_locations": np.pad(np.stack([spatial, spatial]), ((0, 2), (0, 0), (0, 0))),
    }
    logits = np.asarray(jax.jit(make_eval_step(model))(params, batch))[:2]
    z = logits - logits.max(-1, keepdims=True)
    ref = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
    np.testing.assert_allclose(probs, ref, rtol=1e-5, atol=1e-6)


def test_unknown_id_zero_feature_fallback(serving):
    *_, sm = serving
    probs = sm.predict(["meme"], [{"id": "missing"}])
    assert np.isfinite(probs).all() and probs.shape == (1, 2)


def test_inline_features_instance(serving):
    *_, sm = serving
    rng = np.random.default_rng(1)
    probs = sm.predict(["a meme"], [{
        "features": rng.standard_normal((6, 32)).tolist(),
        "spatial": rng.uniform(0, 1, (6, 5)).tolist(),
    }])
    assert np.isfinite(probs).all()


def test_http_server_microbatches_concurrent_requests(serving):
    *_, sm = serving
    server = InferenceServer(sm, port=0, linger_ms=150.0)
    server.start()
    try:
        url = f"http://127.0.0.1:{server.port}"

        with urllib.request.urlopen(f"{url}/healthz", timeout=10) as r:
            assert json.load(r)["status"] == "ok"

        results, errs = [], []
        barrier = threading.Barrier(3)

        def hit():
            try:
                barrier.wait(10)
                req = urllib.request.Request(
                    f"{url}/predict",
                    data=json.dumps({"text": "hateful meme", "id": "42"}).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=30) as r:
                    results.append(json.load(r))
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=hit) for _ in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(30)
        assert not errs and len(results) == 3
        p0 = results[0]
        assert all(abs(r["probability"] - p0["probability"]) < 1e-6 for r in results)
        assert {r["prediction"] for r in results} == {p0["prediction"]}
        # the barrier + 150 ms linger means at least one dispatch batched >1
        assert server.batcher.stats["max_batch"] >= 2

        # batch endpoint
        req = urllib.request.Request(
            f"{url}/predict_batch",
            data=json.dumps({"instances": [
                {"text": "a", "id": "42"}, {"text": "b", "id": "missing"}]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            out = json.load(r)
        assert len(out) == 2 and all("probability" in o for o in out)
    finally:
        server.stop()


def test_seq_bucket_routing_parity(serving):
    """Bucketed serving returns byte-identical probabilities: padding is
    masked, so a short batch dispatched at the 8-token bucket must agree
    exactly with the single 12-token program (float32 fixture)."""
    cfg, model, params, store, tok, sm = serving
    sb = ServingModel(model, params, tok, store, max_seq_length=12,
                      num_regions=6, feature_dim=32, batch_size=4,
                      seq_buckets=(8,))
    assert sb.seq_buckets == (8, 12)
    sb.warmup()  # compiles both bucket programs
    short = ["love", "a meme"]                      # ≤ 8 tokens → bucket 8
    long = ["one two three four five six seven eight nine"]  # > 8 → bucket 12
    np.testing.assert_array_equal(
        sb.predict(short, [{"id": "42"}, {}]), sm.predict(short, [{"id": "42"}, {}]))
    np.testing.assert_array_equal(
        sb.predict(long, [{"id": "42"}]), sm.predict(long, [{"id": "42"}]))


def test_pick_bucket_and_normalization(serving):
    cfg, model, params, store, tok, _ = serving
    sb = ServingModel(model, params, tok, store, max_seq_length=12,
                      num_regions=6, feature_dim=32, batch_size=4,
                      seq_buckets=(12, 5, 200, 5))  # dedup, drop ≥ max, sort
    assert sb.seq_buckets == (5, 12)
    assert sb._pick_bucket(1) == 5
    assert sb._pick_bucket(5) == 5
    assert sb._pick_bucket(6) == 12
    assert sb._pick_bucket(99) == 12
    # default: single program, no slicing path
    s1 = ServingModel(model, params, tok, store, max_seq_length=12,
                      num_regions=6, feature_dim=32, batch_size=4)
    assert s1.seq_buckets == (12,)


def test_healthz_reports_latency_percentiles(serving):
    *_, sm = serving
    server = InferenceServer(sm, port=0, linger_ms=1.0)
    server.start()
    try:
        url = f"http://127.0.0.1:{server.port}"
        for _ in range(3):
            req = urllib.request.Request(
                f"{url}/predict",
                data=json.dumps({"text": "meme", "id": "42"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                json.load(r)
        with urllib.request.urlopen(f"{url}/healthz", timeout=10) as r:
            h = json.load(r)
        assert h["requests"] >= 3
        assert h["latency_ms_p50"] > 0
        assert h["latency_ms_p99"] >= h["latency_ms_p50"]
        assert h["latency_ms_mean"] > 0
    finally:
        server.stop()


def test_microbatcher_groups_mixed_lengths_by_bucket(serving):
    """Co-arriving short + long requests dispatch as SEPARATE batches (one
    per seq bucket) so short traffic keeps the short-program rate; results
    still match the unbucketed model exactly."""
    cfg, model, params, store, tok, sm = serving
    sb = ServingModel(model, params, tok, store, max_seq_length=12,
                      num_regions=6, feature_dim=32, batch_size=4,
                      seq_buckets=(8,))
    seen_seqs = []
    orig = sb.predict_async  # the pipelined batcher dispatches through this

    def spy(texts, instances=None):
        ids, mask, _ = tok.encode_batch(list(texts), sb.max_seq_length)
        seen_seqs.append(sb._pick_bucket(int(mask.sum(-1).max())))
        return orig(texts, instances)

    sb.predict_async = spy
    server = InferenceServer(sb, port=0, linger_ms=300.0)
    server.start()
    try:
        url = f"http://127.0.0.1:{server.port}"
        texts = ["love", "one two three four five six seven eight nine", "a meme"]
        results = [None] * 3
        barrier = threading.Barrier(3)

        def hit(k):
            barrier.wait(10)
            req = urllib.request.Request(
                f"{url}/predict",
                data=json.dumps({"text": texts[k], "id": "42"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                results[k] = json.load(r)

        threads = [threading.Thread(target=hit, args=(k,)) for k in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(30)
        assert all(r is not None for r in results)
        # the long text went out at 12, the two short ones together at 8
        assert sorted(seen_seqs) == [8, 12]
        assert server.batcher.stats["batches"] == 2
        assert server.batcher.stats["requests"] == 3
        # exact agreement with the single-program model
        ref = sm.predict(texts, [{"id": "42"}] * 3)
        for k in range(3):
            assert abs(results[k]["probability"] - float(ref[k][1])) < 1e-6
    finally:
        server.stop()


def test_mesh_sharded_serving_parity(serving):
    """ServingModel(mesh=...) shards the compiled batch over dp (and params
    over mp via the tp rules); predictions match the single-device server."""
    from multimodal_classification_tpu.parallel.mesh import build_mesh

    cfg, model, params, store, tok, sm = serving
    mesh = build_mesh((4, 2))  # dp=4 x mp=2 over the 8-device CPU mesh
    sm_mesh = ServingModel(model, params, tok, store, max_seq_length=12,
                           num_regions=6, feature_dim=32, batch_size=4,
                           mesh=mesh)
    texts = ["this is a hateful meme", "love", "w w w", "meme"]
    insts = [{"id": "42"}, {"id": "42"}, {"id": "nope"}, {"id": "42"}]
    ref = sm.predict(texts, insts)
    got = sm_mesh.predict(texts, insts)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)


def test_mesh_sharded_serving_int8_and_batch_divisibility(serving):
    from multimodal_classification_tpu.parallel.mesh import build_mesh

    cfg, model, params, store, tok, sm = serving
    mesh = build_mesh((8, 1))
    with pytest.raises(ValueError, match="not divisible"):
        ServingModel(model, params, tok, store, max_seq_length=12,
                     num_regions=6, feature_dim=32, batch_size=6, mesh=mesh)
    sm8 = ServingModel(model, params, tok, store, max_seq_length=12,
                       num_regions=6, feature_dim=32, batch_size=8,
                       int8=True, int8_min_dim=8, mesh=mesh)
    sm8.calibrate(["a meme", "love w w"], [{"id": "42"}, {"id": "42"}])
    ref8 = ServingModel(model, params, tok, store, max_seq_length=12,
                        num_regions=6, feature_dim=32, batch_size=8,
                        int8=True, int8_min_dim=8)
    ref8.calibrate(["a meme", "love w w"], [{"id": "42"}, {"id": "42"}])
    texts = ["hateful meme", "love"]
    insts = [{"id": "42"}, {"id": "42"}]
    np.testing.assert_allclose(sm8.predict(texts, insts),
                               ref8.predict(texts, insts),
                               rtol=2e-5, atol=1e-6)


def test_metrics_endpoint_prometheus_format(serving):
    cfg, model, params, store, tok, sm = serving
    server = InferenceServer(sm, port=0, linger_ms=1.0)
    server.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/predict",
            data=json.dumps({"text": "a meme", "id": "42"}).encode())
        with urllib.request.urlopen(req, timeout=30):
            pass
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/metrics", timeout=10) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            body = r.read().decode()
        assert "# TYPE mmc_serving_requests counter" in body
        lines = dict(
            l.split(" ", 1) for l in body.strip().splitlines()
            if not l.startswith("#"))
        assert float(lines["mmc_serving_requests"]) >= 1
        assert "mmc_serving_latency_ms_p50" in lines
    finally:
        server.stop()


def test_wire_dtype_follows_model_compute_dtype(serving):
    """The visual-feature wire dtype is the model's compute dtype: a bf16
    model ships bf16 features (half the host->device bytes -- the dominant
    per-dispatch cost on a slow link) with IDENTICAL predictions, because
    VisualEmbeddings' first op is that exact cast; an f32 model keeps an
    f32 wire."""
    cfg, model, params, store, tok, sm = serving
    # the module fixture is float32 -> f32 wire
    batch = sm._build_batch(["a meme"], [{"id": "42"}])
    assert np.dtype(batch["visual_features"].dtype) == np.float32

    import dataclasses

    bcfg = dataclasses.replace(cfg, dtype="bfloat16")
    bmodel = ViLBERTForClassification(bcfg)
    b = dummy_batch(bcfg, 1, 12, 6)
    bparams = bmodel.init(jax.random.key(0), **model_inputs(b))["params"]
    bsm = ServingModel(bmodel, bparams, tok, store, max_seq_length=12,
                       num_regions=6, feature_dim=32, batch_size=4)
    assert bsm._wire_dtype == np.dtype("bfloat16")
    texts = ["this is a hateful meme", "love"]
    insts = [{"id": "42"}, {"id": "missing"}]
    got = bsm.predict(texts, insts)
    # f32-wire twin: same params/model, wire cast disabled
    bsm_f32 = ServingModel(bmodel, bparams, tok, store, max_seq_length=12,
                           num_regions=6, feature_dim=32, batch_size=4)
    bsm_f32._wire_dtype = np.dtype(np.float32)
    ref = bsm_f32.predict(texts, insts)
    np.testing.assert_array_equal(got, ref)


def test_device_feature_cache_parity_and_fallback(serving):
    """Id-only requests through the device-resident gather path must produce
    the SAME probabilities as the host feature path, including the
    zero-feature / all-ones-mask fallback for unknown ids."""
    cfg, model, params, store, tok, _ = serving
    sm = ServingModel(model, params, tok, store, max_seq_length=12,
                      num_regions=6, feature_dim=32, batch_size=4)
    texts = ["this is a hateful meme", "love", "meme"]
    insts = [{"id": "42"}, {"id": "missing"}, {"id": "42"}]
    host = sm.predict(texts, insts)
    n = sm.preload_features(["42", "also-missing-in-store"])
    assert n == 1  # ids the store can't resolve are dropped
    assert sm._cache is not None
    cached = sm.predict(texts, insts)
    np.testing.assert_allclose(cached, host, rtol=1e-5, atol=1e-6)
    # inline-feature instances bypass the cache (host path)
    rng = np.random.default_rng(1)
    inline = [{"features": rng.standard_normal((6, 32)).astype(np.float32)}]
    got = sm.predict(["inline"], inline)
    assert got.shape == (1, 2)


def test_capped_feature_cache_falls_back_to_host_for_evicted_ids(serving):
    """preload_features(max_bytes=...) keeps only what fits; requests for a
    known-but-not-resident id must take the HOST feature path (same
    predictions), never the cached gather's zero-feature fallback."""
    cfg, model, params, _, tok, _ = serving
    rng = np.random.default_rng(3)
    ids = ["a1", "a2", "a3"]
    store = DictFeatureStore(
        {i: rng.standard_normal((6, 32)).astype(np.float32) for i in ids},
        {i: rng.uniform(0, 1, (6, 5)).astype(np.float32) for i in ids},
    )
    sm = ServingModel(model, params, tok, store, max_seq_length=12,
                      num_regions=6, feature_dim=32, batch_size=4)
    texts = ["one meme", "two memes", "never seen"]
    insts = [{"id": "a1"}, {"id": "a3"}, {"id": "truly-unknown"}]
    host = sm.predict(texts, insts)

    row_bytes = 6 * (32 * 4 + 5 * 4 + 4)
    n = sm.preload_features(ids, max_bytes=row_bytes)  # exactly one row fits
    assert n == 1 and "a1" in sm._cache.index

    calls = []
    orig = sm._predict_cached
    sm._predict_cached = lambda *a: calls.append(1) or orig(*a)
    # a3 is store-resolvable but evicted → host path, identical predictions
    capped = sm.predict(texts, insts)
    np.testing.assert_allclose(capped, host, rtol=1e-5, atol=1e-6)
    assert not calls
    # all-resident batch (incl. a truly-unknown id) keeps the cached path
    # and the resident id's prediction matches the host path
    res = sm.predict(["one meme", "x"], [{"id": "a1"}, {"id": "nope"}])
    assert calls
    np.testing.assert_allclose(res[0], host[0], rtol=1e-5, atol=1e-6)


def test_batch_size_routing_parity(serving):
    """Multiple compiled batch sizes: a single request dispatches the
    smallest program; probabilities identical to the full-batch pad."""
    cfg, model, params, store, tok, _ = serving
    sm_multi = ServingModel(model, params, tok, store, max_seq_length=12,
                            num_regions=6, feature_dim=32, batch_size=4,
                            batch_sizes=(1, 4))
    sm_single = ServingModel(model, params, tok, store, max_seq_length=12,
                             num_regions=6, feature_dim=32, batch_size=4)
    assert sm_multi.batch_sizes == (1, 4)
    assert sm_multi._pick_batch(1) == 1 and sm_multi._pick_batch(2) == 4
    one = sm_multi.predict(["one meme"], [{"id": "42"}])
    ref = sm_single.predict(["one meme"], [{"id": "42"}])
    np.testing.assert_allclose(one, ref, rtol=1e-5, atol=1e-6)
    # oversize still rejected at the largest program
    with pytest.raises(ValueError):
        sm_multi.predict(["a"] * 5)


def test_cached_path_with_batch_sizes_and_buckets(serving):
    cfg, model, params, store, tok, _ = serving
    sm = ServingModel(model, params, tok, store, max_seq_length=12,
                      num_regions=6, feature_dim=32, batch_size=4,
                      batch_sizes=(1, 4), seq_buckets=(8,))
    host = sm.predict(["love"], [{"id": "42"}])
    sm.preload_features(["42"])
    np.testing.assert_allclose(sm.predict(["love"], [{"id": "42"}]), host,
                               rtol=1e-5, atol=1e-6)
    long = ["a " * 20]
    host_long = ServingModel(model, params, tok, store, max_seq_length=12,
                             num_regions=6, feature_dim=32,
                             batch_size=4).predict(long, [{"id": "42"}])
    np.testing.assert_allclose(sm.predict(long, [{"id": "42"}]), host_long,
                               rtol=1e-5, atol=1e-6)


def test_busy_hold_cap_dispatches_while_busy(serving):
    """busy_hold_ms=0 must dispatch after the linger even with a batch in
    flight (the latency knob); default (None) behavior is covered by the
    other micro-batcher tests."""
    from multimodal_classification_tpu.serving.server import _MicroBatcher

    _cfg, _model, _params, _store, _tok, sm = serving
    b = _MicroBatcher(sm, linger_ms=1.0, busy_hold_ms=0.0)
    try:
        futs = [b.submit({"text": "a meme"}) for _ in range(6)]
        out = [f.result(timeout=60) for f in futs]
        assert all(0.0 <= r["probability"] <= 1.0 for r in out)
        assert b.stats["requests"] == 6
    finally:
        b.close()
