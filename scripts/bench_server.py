#!/usr/bin/env python
"""Serving throughput THROUGH the HTTP stack (VERDICT r2 weak #5).

scripts/bench_serving.py measures the compiled eval step directly (the
4795 memes/s int8-fused-FFN record @ batch 64 / seq-32). This bench runs the
actual product surface — `mmc-tpu serve`'s micro-batching HTTP server — with
localhost clients over keep-alive connections, and reports achieved rps +
latency percentiles, so the delta between the compiled-step record and what
a user sees (HTTP parse + JSON + queueing + linger, all on this 1-core host)
is a measured number instead of a guess.

Two client shapes:
  * batch  — POST /predict_batch with B instances per call (bulk scoring:
             HTTP/JSON overhead amortized over the batch);
  * single — POST /predict, C concurrent connections (online traffic:
             per-request overhead dominates on a 1-core host; the
             micro-batcher coalesces co-arriving requests).

SERVER_TINY=1 runs the tiny config on CPU (harness smoke, used by tests).
Prints one JSON line per mode.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

# SERVER_PLATFORM=cpu: force the backend via jax.config (the JAX_PLATFORMS
# env var is latched by the axon sitecustomize before user code runs)
if os.environ.get("SERVER_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SERVER_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def drive(server, mode: str, n_requests: int, concurrency: int,
          batch: int, text: str, ids=None) -> dict:
    """Client-drive a started InferenceServer over keep-alive connections;
    returns {"rps", "p50_ms", "p99_ms", ...}. Importable (tests use it with
    the tiny config). ``ids``: per-instance feature ids (cycled) — with a
    preloaded device cache only these + the text cross the HTTP/host link."""
    import http.client

    port = server.port
    def inst(i):
        d = {"text": text}
        if ids:
            d["id"] = ids[i % len(ids)]
        return d
    payload_one = json.dumps(inst(0)).encode()
    payload_batch = json.dumps(
        {"instances": [inst(i) for i in range(batch)]}).encode()
    headers = {"Content-Type": "application/json"}
    done = threading.Event()
    counts = [0] * concurrency
    errors = [0] * concurrency

    client_timeout = float(os.environ.get("SERVER_CLIENT_TIMEOUT", "300"))

    def worker(w: int):
        conn = http.client.HTTPConnection("127.0.0.1", port,
                                          timeout=client_timeout)
        while not done.is_set():
            try:
                if mode == "batch":
                    conn.request("POST", "/predict_batch", payload_batch, headers)
                    resp = conn.getresponse()
                    body = resp.read()
                    if resp.status == 200:
                        counts[w] += len(json.loads(body))
                    else:
                        errors[w] += batch
                else:
                    conn.request("POST", "/predict", payload_one, headers)
                    resp = conn.getresponse()
                    resp.read()
                    if resp.status == 200:
                        counts[w] += 1
                    else:
                        errors[w] += 1
            except Exception:
                errors[w] += 1
                conn.close()
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=client_timeout)
            # errors count toward termination: a server that can't keep up
            # must still end the bench (with its error rate on record), not
            # spin the retry loop forever
            if sum(counts) + sum(errors) >= n_requests:
                done.set()
        conn.close()

    threads = [threading.Thread(target=worker, args=(w,), daemon=True)
               for w in range(concurrency)]
    server.batcher.reset_stats()
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    hard_stop = t0 + float(os.environ.get("SERVER_DRIVE_BUDGET", "600"))
    while any(t.is_alive() for t in threads):
        if time.perf_counter() >= hard_stop:
            done.set()  # drive budget exhausted: bank what we have
            break
        time.sleep(5)
        print(f"  drive[{mode}]: ok={sum(counts)} err={sum(errors)} "
              f"t={time.perf_counter() - t0:.0f}s", file=sys.stderr, flush=True)
    for t in threads:
        t.join(timeout=max(client_timeout, 30))
    dt = time.perf_counter() - t0
    total = sum(counts)
    stats = {**server.batcher.latency_stats(),
             **server.batcher.phase_stats()}
    return {
        "mode": mode,
        "concurrency": concurrency,
        "batch_per_call": batch if mode == "batch" else 1,
        "requests": total,
        "errors": sum(errors),
        "rps": round(total / dt, 1),
        **stats,
        "batches": server.batcher.stats["batches"],
        "mean_dispatch_batch": round(
            server.batcher.stats["requests"]
            / max(server.batcher.stats["batches"], 1), 1),
    }


def main() -> int:
    import jax

    from multimodal_classification_tpu.data import (
        WordPieceTokenizer,
        build_test_vocab,
    )
    from multimodal_classification_tpu.models.vilbert import (
        ViLBERTForClassification,
        dummy_batch,
    )
    from multimodal_classification_tpu.serving.server import InferenceServer, ServingModel
    from multimodal_classification_tpu.training.train import model_inputs

    tiny = bool(os.environ.get("SERVER_TINY"))
    if tiny:
        from multimodal_classification_tpu.config import tiny_vilbert_config

        cfg = tiny_vilbert_config(dtype="float32", use_pallas_attention=False)
        batch_size, seq_buckets, int8 = 8, (16,), False
        n_requests, concurrency, batch = 64, 4, 8
    else:
        from multimodal_classification_tpu.config import facebook_vilbert_config

        # the record config: int8 MXU + fused int8 FFN, batch 64, 32-token
        # bucket (scripts/bench_serving.py measured 4795 memes/s at the
        # compiled step)
        cfg = facebook_vilbert_config()
        batch_size = int(os.environ.get("SERVER_BATCH", "64"))
        seq_buckets = (32,)
        int8 = os.environ.get("SERVER_INT8", "1") == "1"
        n_requests = int(os.environ.get("SERVER_REQUESTS", "1024"))
        concurrency = int(os.environ.get("SERVER_CONCURRENCY", "32"))
        batch = batch_size

    dev = jax.devices()[0]
    print(f"server bench on {dev.platform}:{dev.device_kind}", file=sys.stderr)
    model = ViLBERTForClassification(cfg)
    regions = 100 if not tiny else 8
    init_batch = dummy_batch(cfg, 1, 16, regions)
    params = model.init(jax.random.key(0), **model_inputs(init_batch))["params"]
    tok = WordPieceTokenizer(build_test_vocab())

    # feature store: synthetic ids so requests can serve BY ID. With
    # SERVER_CACHE=1 (default) the features are preloaded into HBM and only
    # token ids + row indices cross the link per dispatch — the round-3
    # transfer-bound result (150 rps bulk at batch 64: ~26 MB of features
    # per dispatch over a ~20 MB/s link) becomes compute-bound.
    from multimodal_classification_tpu.data import DictFeatureStore

    n_ids = int(os.environ.get("SERVER_N_IDS", "256"))
    rng = np.random.default_rng(0)
    ids = [str(10000 + i) for i in range(n_ids)]
    store = DictFeatureStore(
        {i: rng.standard_normal((regions, cfg.v_feature_size)).astype(np.float32)
         for i in ids},
        {i: rng.uniform(0, 1, (regions, 5)).astype(np.float32) for i in ids},
    )
    use_cache = os.environ.get("SERVER_CACHE", "1") == "1"
    batch_sizes = None
    if os.environ.get("SERVER_BATCH_SIZES"):
        batch_sizes = tuple(
            int(b) for b in os.environ["SERVER_BATCH_SIZES"].split(","))
    sm = ServingModel(model, params, tok, store,
                      max_seq_length=128 if not tiny else 16,
                      num_regions=regions,
                      feature_dim=cfg.v_feature_size,
                      batch_size=batch_size, int8=int8,
                      seq_buckets=seq_buckets if not tiny else (),
                      batch_sizes=batch_sizes)
    if use_cache:
        n_loaded = sm.preload_features(ids)
        print(f"device feature cache: {n_loaded} ids "
              f"({sm._cache.nbytes / 1e6:.0f} MB resident)", file=sys.stderr)
    t0 = time.perf_counter()
    sm.warmup()
    print(f"warmup (compile): {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    text = "this meme is about people"  # ~8 tokens → the 32 bucket
    linger = float(os.environ.get("SERVER_LINGER_MS", "2.0"))
    # on this host the dominant per-dispatch cost is the visual-feature
    # upload over the ~20 MB/s relay link (~1.3 s at batch 64 bf16), so the
    # queue-wait under full concurrency far exceeds the 30 s product default
    req_timeout = float(os.environ.get("SERVER_REQUEST_TIMEOUT", "240"))
    hold = os.environ.get("SERVER_BUSY_HOLD_MS")
    for mode in os.environ.get("SERVER_MODES", "batch,single").split(","):
        server = InferenceServer(sm, port=0, linger_ms=linger,
                                 request_timeout_s=req_timeout,
                                 busy_hold_ms=float(hold) if hold else None)
        server.start()
        try:
            result = drive(server, mode, n_requests, concurrency, batch, text,
                           ids=ids)
        finally:
            server.stop()
        result["device_cache"] = use_cache
        print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
