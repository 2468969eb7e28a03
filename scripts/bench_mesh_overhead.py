#!/usr/bin/env python
"""Same-run A/B: plain single-device train program vs the dp=1(×mp=1)
shard_map/device-resident MESH program — bounds the mesh-path tax.

Why (round-4 verdict #5): multi-chip correctness is proven (CPU-mesh +
multi-host dryruns, numerical parity), but the repo had no measurement of
what the mesh machinery itself COSTS on the real chip. A dp=1 mesh runs the
exact multi-chip program (shard_map local gather, sharding-annotated params,
degenerate collectives) on one device — the difference vs the plain program
is pure mesh overhead, and feeds the v5e-8 scaling projection in
docs/PERFORMANCE.md.

Both arms are SINGLE-step jitted programs (the K-step scan is orthogonal
dispatch amortisation — round-1 measured K=10 vs K=1 neutral on this relay),
donated state, same index schedule, timing windows closed by a device→host
value fetch.

Usage: python scripts/bench_mesh_overhead.py   (runs on the live backend)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# this script builds its own per-leaf single-step programs from setup()'s
# parts — the bench headline's flat-slab default would hand us slab-form
# params they can't consume
os.environ["BENCH_SLAB"] = "0"

MEASURE_STEPS = int(os.environ.get("MESH_AB_STEPS", "50"))
WARMUP = 3


def main() -> int:
    import bench

    import jax
    import jax.numpy as jnp
    import numpy as np

    # reuse the bench fixture/config (headline vilbert_lmdb shapes) but
    # build our own single-step programs
    _step, _state, data, _it, rng_key, _k, parts = bench.setup(want_parts=True)
    model, loss_fn, tx = parts["model"], parts["loss_fn"], parts["tx"]
    bucket, params, ds = parts["bucket"], parts["params"], parts["ds"]

    from multimodal_classification_tpu.data.device_cache import (
        build_sharded_device_data,
        epoch_indices,
        make_device_train_step,
        make_sharded_device_train_step,
        sharded_epoch_indices,
    )
    from multimodal_classification_tpu.parallel.mesh import build_mesh, shard_params
    from multimodal_classification_tpu.training.train import TrainState

    del _step, _state  # rebuilt per arm below

    def measure(name, step, state, data_arm, batches):
        t0 = time.perf_counter()
        for _ in range(WARMUP):
            state, m = step(state, data_arm, jnp.asarray(next(batches)), rng_key)
        _ = float(m["loss"])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(MEASURE_STEPS):
            state, m = step(state, data_arm, jnp.asarray(next(batches)), rng_key)
        loss = float(m["loss"])
        dt = time.perf_counter() - t0
        rec = {
            "arm": name,
            "ms_per_step": round(dt / MEASURE_STEPS * 1e3, 2),
            "memes_per_sec": round(MEASURE_STEPS * bench.BATCH_SIZE / dt, 1),
            "compile_warmup_s": round(compile_s, 1),
            "loss": round(loss, 4),
        }
        print(f"[{name}] {rec['ms_per_step']} ms/step = "
              f"{rec['memes_per_sec']}/s (compile {compile_s:.0f}s, "
              f"loss {loss:.4f})", file=sys.stderr, flush=True)
        print(json.dumps(rec), flush=True)
        return rec

    def plain_batches():
        e = 0
        while True:
            yield from epoch_indices(bench.N_EXAMPLES, bench.BATCH_SIZE, e, seed=0)
            e += 1

    def mesh_batches():
        e = 0
        while True:
            yield from sharded_epoch_indices(
                bench.N_EXAMPLES, 1, bench.BATCH_SIZE, e, seed=0)
            e += 1

    recs = []
    for rep in range(int(os.environ.get("REPS", "2"))):
        # --- plain arm -------------------------------------------------
        state = TrainState(jnp.zeros((), jnp.int32),
                           jax.tree.map(jnp.array, params), tx.init(params))
        step = jax.jit(
            make_device_train_step(model, loss_fn, tx, seq_bucket=bucket),
            donate_argnums=0)
        r = measure("plain_1dev", step, state, data, plain_batches())
        r["rep"] = rep
        recs.append(r)

        # --- mesh arm (dp=1 × mp=1: the full multi-chip program) ------
        mesh = build_mesh((1, 1))
        mesh_data = build_sharded_device_data(ds, mesh,
                                              feature_dtype=jnp.bfloat16)
        mparams = shard_params(jax.tree.map(jnp.array, params), mesh)
        mstate = TrainState(jnp.zeros((), jnp.int32), mparams,
                            jax.jit(tx.init, out_shardings=None)(mparams))
        mstep = jax.jit(
            make_sharded_device_train_step(model, loss_fn, tx, mesh,
                                           seq_bucket=bucket),
            donate_argnums=0)
        r = measure("mesh_dp1", mstep, mstate, mesh_data, mesh_batches())
        r["rep"] = rep
        recs.append(r)

    plain = [r["ms_per_step"] for r in recs if r["arm"] == "plain_1dev"]
    meshr = [r["ms_per_step"] for r in recs if r["arm"] == "mesh_dp1"]
    tax = (min(meshr) / min(plain) - 1) * 100
    print(f"mesh-path tax (best-of-reps): {tax:+.1f}%",
          file=sys.stderr, flush=True)
    print(json.dumps({"mesh_tax_pct": round(tax, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
