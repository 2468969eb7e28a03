"""Benchmark: end-to-end training throughput of the headline pipeline.

Measures steady-state memes/sec of the full ``vilbert_lmdb_train`` hot path
on one chip: LMDB feature decode + batch assembly on host threads feeding a
jitted AdamW train step of the Facebook-exact ViLBERT (batch 16, 128 text
tokens, 100×2048 regions — the 0.7580-AUROC configuration, reference
conf/base/parameters.yml:570-610).

Baseline: the reference publishes NO throughput numbers (BASELINE.md) — its
metrics are quality-only. ``vs_baseline`` is therefore computed against a
documented engineering estimate of the PyTorch reference on its stated
hardware ("CUDA GPU, 8-16GB"): ~120 GFLOP/meme for fwd+bwd at this config on
a V100-class GPU at a generous 35% utilisation with torch's synchronous
num_workers=0 input path ≈ 100 memes/sec. The north-star target is ≥5× this
(BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

# persistent XLA compilation cache: repeat bench runs skip the 30-60s compile
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np

REFERENCE_MEMES_PER_SEC_ESTIMATE = 100.0
BATCH_SIZE = 16
SEQ_LEN = 128
NUM_REGIONS = 100
FEATURE_DIM = 2048
WARMUP_STEPS = 5
MEASURE_STEPS = 30
N_EXAMPLES = 512


def _build_fixture(cache_dir: str) -> str:
    """Fabricated detectron.lmdb (100×2048 pickled features, real format)."""
    from multimodal_classification_tpu.data.lmdb_store import write_feature_lmdb

    path = os.path.join(cache_dir, f"bench_{N_EXAMPLES}x{NUM_REGIONS}.lmdb")
    if os.path.exists(path):
        return path
    os.makedirs(cache_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    ids = [str(10000 + i) for i in range(N_EXAMPLES)]
    feats = rng.standard_normal((N_EXAMPLES, NUM_REGIONS, FEATURE_DIM)).astype(np.float32)
    boxes = rng.uniform(0, 1000, (N_EXAMPLES, NUM_REGIONS, 4)).astype(np.float32)
    write_feature_lmdb(path, ids, feats, boxes)
    return path


def main() -> int:
    import jax

    import pandas as pd

    from multimodal_classification_tpu.config import (
        DataConfig,
        ExperimentConfig,
        TrainingConfig,
        facebook_vilbert_config,
    )
    from multimodal_classification_tpu.data import (
        BatchLoader,
        MemesDataset,
        WordPieceTokenizer,
        build_test_vocab,
    )
    from multimodal_classification_tpu.data.lmdb_store import LMDBFeatureStore
    from multimodal_classification_tpu.models.vilbert import ViLBERTForClassification
    from multimodal_classification_tpu.training.train import Trainer, model_inputs

    dev = jax.devices()[0]
    print(f"benchmarking on {dev.platform}:{dev.device_kind}", file=sys.stderr)

    lmdb_path = _build_fixture("data/09_bench_cache")
    store = LMDBFeatureStore(lmdb_path)

    rng = np.random.default_rng(0)
    words = ["the", "meme", "is", "hateful", "not", "love", "hate", "people", "a", "this"]
    df = pd.DataFrame(
        {
            "id": [str(10000 + i) for i in range(N_EXAMPLES)],
            "text": [" ".join(rng.choice(words, 12)) for _ in range(N_EXAMPLES)],
            "label": rng.integers(0, 2, N_EXAMPLES),
        }
    )
    tok = WordPieceTokenizer(build_test_vocab())
    ds = MemesDataset(df, tok, store, max_seq_length=SEQ_LEN,
                      max_regions=NUM_REGIONS, feature_dim=FEATURE_DIM)
    loader = BatchLoader(ds, BATCH_SIZE, shuffle=True, seed=0, drop_last=True, prefetch=4)

    cfg = facebook_vilbert_config()
    tcfg = TrainingConfig(batch_size=BATCH_SIZE, warmup_steps=2000, mesh_shape=(-1, 1))
    ex = ExperimentConfig(name="bench", model=cfg, training=tcfg, data=DataConfig())
    model = ViLBERTForClassification(cfg)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(model, ex, checkpoint_dir=tmp)
        first = next(iter(loader))
        params = model.init(jax.random.key(0), **model_inputs(first))["params"]
        state, train_step, _ = trainer.init_state(params, total_steps=10_000)
        rng_key = jax.random.key(1, impl=tcfg.rng_impl)

        def batches():
            while True:
                yield from loader

        it = batches()
        for _ in range(WARMUP_STEPS):
            state, m = train_step(state, trainer.put_batch(next(it)), rng_key)
        # fetch the VALUE (device→host) — on remote/tunneled backends
        # block_until_ready can return before compute completes
        _ = float(m["loss"])

        t0 = time.perf_counter()
        for _ in range(MEASURE_STEPS):
            state, m = train_step(state, trainer.put_batch(next(it)), rng_key)
        _ = float(m["loss"])
        dt = time.perf_counter() - t0

    memes_per_sec = MEASURE_STEPS * BATCH_SIZE / dt
    print(
        f"{MEASURE_STEPS} steps x batch {BATCH_SIZE} in {dt:.2f}s "
        f"({dt / MEASURE_STEPS * 1000:.1f} ms/step)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "train_memes_per_sec_per_chip (vilbert_lmdb config, end-to-end host LMDB feed + fwd/bwd/opt)",
                "value": round(memes_per_sec, 2),
                "unit": "memes/sec",
                "vs_baseline": round(memes_per_sec / REFERENCE_MEMES_PER_SEC_ESTIMATE, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
