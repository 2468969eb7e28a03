#!/usr/bin/env python
"""Same-run A/B of the TRAINING fused-kernel paths at the flagship config.

Measures the bench.py train step (vilbert_lmdb config: device-resident data,
batch 16, seq-32 bucket, AdamW) with each requested variant in ONE process —
relay conditions vary minute to minute, so cross-process comparisons are
noise (see CLAUDE.md). Each variant: compile + warmup, then MEASURE_STEPS
steps timed with a device→host value fetch closing the window.

Usage:
    python scripts/bench_train_fused.py            # baseline vs ffn-train
    VARIANTS=base,ffn,attn,both python scripts/bench_train_fused.py
    REPS=2 python scripts/bench_train_fused.py

Writes one JSON line per measurement to stdout; human lines on stderr.
Compiled programs land in the repo cache (bench._configure_jax_cache), so
the winning variant is warm for the driver's budgeted bench run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANT_ENVS = {
    "base": {"BENCH_FFN_TRAIN": "0", "BENCH_ATTN_TRAIN": "0",
             "MMC_ATTN_TRAIN_NO_SPLIT": "0"},
    "ffn": {"BENCH_FFN_TRAIN": "1", "BENCH_ATTN_TRAIN": "0",
            "MMC_ATTN_TRAIN_NO_SPLIT": "0"},
    # attn = the shipping default: text layers fused (single-pass bwd),
    # visual unfused (the split extension measured slower — see below)
    "attn": {"BENCH_FFN_TRAIN": "0", "BENCH_ATTN_TRAIN": "1",
             "MMC_ATTN_TRAIN_SPLIT": "0"},
    # attn_split = + visual layers via the two-pass split backward.
    # MEASURED SLOWER both reps (22.36/22.41 vs attn 21.53/21.49 ms/step):
    # one item per program (28% pad) + double weight fetch across the two
    # passes — kept as the A/B arm
    "attn_split": {"BENCH_FFN_TRAIN": "0", "BENCH_ATTN_TRAIN": "1",
                   "MMC_ATTN_TRAIN_SPLIT": "1"},
    "both": {"BENCH_FFN_TRAIN": "1", "BENCH_ATTN_TRAIN": "1",
             "MMC_ATTN_TRAIN_SPLIT": "0"},
    # flat-slab params/optimizer (training/flat_slab.py, round 5): params +
    # Adam moments live as contiguous per-dtype slabs through the whole step
    # — targets the ~4.2 ms/step of small-leaf carry copies + scattered
    # optimizer fusions the per-op profile pinned on the ~600 small leaves.
    # Runs ON TOP of the shipping default (text attn-block fusion ON), so
    # the matching baseline arm is "attn".
    "slab": {"BENCH_SLAB": "1", "BENCH_FFN_TRAIN": "0",
             "BENCH_ATTN_TRAIN": "1", "MMC_ATTN_TRAIN_SPLIT": "0"},
    # every leaf slabbed (matmul weights become views into one buffer)
    "slab_all": {"BENCH_SLAB": "all", "BENCH_FFN_TRAIN": "0",
                 "BENCH_ATTN_TRAIN": "1", "MMC_ATTN_TRAIN_SPLIT": "0"},
    # int8-stored device-resident features (dequantised to bf16 in-gather):
    # halves the dataset upload + HBM residency — measures the step-time
    # cost of the dequant against the shipping bf16 storage
    "int8data": {"BENCH_FEATURE_DTYPE": "int8", "BENCH_FFN_TRAIN": "0",
                 "BENCH_ATTN_TRAIN": "1", "MMC_ATTN_TRAIN_SPLIT": "0"},
}


def _reset_env():
    """Variants must not inherit a previous variant's knobs."""
    for k in ("BENCH_SLAB", "BENCH_FFN_TRAIN", "BENCH_ATTN_TRAIN",
              "MMC_ATTN_TRAIN_SPLIT", "BENCH_FEATURE_DTYPE"):
        os.environ.pop(k, None)


def measure(variant: str) -> dict:
    import bench

    _reset_env()
    for k, v in VARIANT_ENVS[variant].items():
        os.environ[k] = v
    t_setup = time.perf_counter()
    step, state, data, it, rng_key, k = bench.setup()
    t0 = time.perf_counter()
    for _ in range(max(bench.WARMUP_STEPS // k, 1)):
        state, m = step(state, data, next(it), rng_key)
    _ = float(m["loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(bench.MEASURE_STEPS // k):
        state, m = step(state, data, next(it), rng_key)
    loss = float(m["loss"])
    dt = time.perf_counter() - t0
    ms_step = dt / bench.MEASURE_STEPS * 1e3
    rec = {
        "variant": variant,
        "ms_per_step": round(ms_step, 2),
        "memes_per_sec": round(bench.MEASURE_STEPS * bench.BATCH_SIZE / dt, 1),
        "compile_warmup_s": round(compile_s, 1),
        "setup_s": round(t0 - t_setup, 1),
        "loss": round(loss, 4),
        "batch": bench.BATCH_SIZE,
    }
    print(f"[{variant}] {ms_step:.1f} ms/step = {rec['memes_per_sec']}/s "
          f"(compile {compile_s:.0f}s, loss {loss:.4f})",
          file=sys.stderr, flush=True)
    return rec


def main():
    variants = os.environ.get("VARIANTS", "base,ffn").split(",")
    reps = int(os.environ.get("REPS", "1"))
    out = []
    for r in range(reps):
        for v in variants:
            try:
                rec = measure(v)
            except Exception as e:  # one broken variant must not kill the run
                rec = {"variant": v, "error": repr(e)[:500]}
                print(f"[{v}] FAILED: {e!r}", file=sys.stderr, flush=True)
            rec["rep"] = r
            out.append(rec)
            print(json.dumps(rec), flush=True)
    ok = [r for r in out if "ms_per_step" in r]
    if not ok:
        return
    best = min(ok, key=lambda r: r["ms_per_step"])
    print(f"best: {best['variant']} @ {best['ms_per_step']} ms/step",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
