#!/usr/bin/env python
"""Same-run A/B: full-resident device dataset vs the capacity-capped
rotating shard window (data/rotation.py) at the flagship train config.

Measures the rotation tax with an ARTIFICIALLY small cap (the bench fixture
fits HBM easily): epoch throughput with all examples resident vs the same
examples rotated through a double-buffered window of N_SHARDS shards —
uploads are issued before each shard's steps, so the transfer should hide
behind compute (105 MB fixture / ~4 shards ≈ 26 MB/shard ≈ 1.3 s on this
~20 MB/s relay link vs ~2.2 s of compute per shard's steps at 21.4 ms/step
— marginal on THIS link; a production PCIe host hides it trivially).

Usage: python scripts/bench_rotation.py    (N_SHARDS=4 REPS=2 by default)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# per-leaf params for this script's own steps (see bench_mesh_overhead.py)
os.environ["BENCH_SLAB"] = "0"


def main() -> int:
    import bench

    import jax
    import jax.numpy as jnp
    import numpy as np

    _step, _state, data, _it, rng_key, _k, parts = bench.setup(want_parts=True)
    model, loss_fn, tx = parts["model"], parts["loss_fn"], parts["tx"]
    bucket, params, ds = parts["bucket"], parts["params"], parts["ds"]
    del _step, _state

    from multimodal_classification_tpu.data.device_cache import (
        epoch_indices,
        make_device_train_step,
        tensorise_host,
    )
    from multimodal_classification_tpu.data.rotation import (
        RotatingDeviceData,
        dataset_nbytes,
    )
    from multimodal_classification_tpu.training.train import TrainState

    n_shards = int(os.environ.get("N_SHARDS", "4"))
    fields, mtl = tensorise_host(ds, jnp.bfloat16)
    cap = int(dataset_nbytes(fields) / n_shards * 2) + 1  # 2 buffers
    rot = RotatingDeviceData(fields, mtl, cap, batch_size=bench.BATCH_SIZE)
    print(f"rotating: {rot.num_shards} shards × {rot.shard_rows} rows",
          file=sys.stderr, flush=True)

    step = jax.jit(
        make_device_train_step(model, loss_fn, tx, seq_bucket=bucket),
        donate_argnums=0)

    def fresh_state():
        return TrainState(jnp.zeros((), jnp.int32),
                          jax.tree.map(jnp.array, params), tx.init(params))

    def run_full(state, epoch):
        n = 0
        for idx in epoch_indices(bench.N_EXAMPLES, bench.BATCH_SIZE, epoch,
                                 seed=0):
            state, m = step(state, data, jnp.asarray(idx), rng_key)
            n += 1
        _ = float(m["loss"])
        return state, n

    def run_rot(state, epoch):
        n = 0
        for sd, idx, _g in rot.epoch_batches(bench.BATCH_SIZE, epoch, seed=0):
            state, m = step(state, sd, jnp.asarray(idx), rng_key)
            n += 1
        _ = float(m["loss"])
        return state, n

    # NOTE: the rotating arm compiles the SAME program as the full arm only
    # when shard shapes differ from the full set — they do (shard_rows <
    # N_EXAMPLES), so warm both.
    recs = []
    for rep in range(int(os.environ.get("REPS", "2"))):
        for name, runner in (("full", run_full), ("rotating", run_rot)):
            state = fresh_state()
            t0 = time.perf_counter()
            state, _ = runner(state, 0)  # warmup epoch (compile + cache)
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            state, steps = runner(state, 1)
            dt = time.perf_counter() - t0
            rec = {
                "arm": name, "rep": rep,
                "epoch_s": round(dt, 2),
                "steps": steps,
                "ms_per_step": round(dt / steps * 1e3, 2),
                "memes_per_sec": round(steps * bench.BATCH_SIZE / dt, 1),
                "warm_epoch_s": round(warm, 1),
            }
            recs.append(rec)
            print(f"[{name} rep{rep}] epoch {dt:.2f}s, "
                  f"{rec['ms_per_step']} ms/step ({steps} steps)",
                  file=sys.stderr, flush=True)
            print(json.dumps(rec), flush=True)

    full = min(r["ms_per_step"] for r in recs if r["arm"] == "full")
    rotm = min(r["ms_per_step"] for r in recs if r["arm"] == "rotating")
    print(json.dumps({"rotation_tax_pct": round((rotm / full - 1) * 100, 2),
                      "n_shards": rot.num_shards}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
