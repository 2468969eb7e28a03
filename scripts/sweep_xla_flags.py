#!/usr/bin/env python
"""Sweep XLA compiler-option sets over the train / serving benchmarks
(subprocess per set, each with its own compilation-cache directory).

Motivation: the batch-64 eval XPlane profile (CLAUDE.md "Eval profile after
the XLA flip") shows the big dense matmuls at ~55% of MXU peak with no single
hotspot — the classic signature of scheduling/prefetch gaps rather than a bad
kernel. The levers for that live behind XLA tuning knobs, not source changes,
so this harness makes an on-hardware A/B cheap to run and honest to read
(same process count, same measurement path, fresh cache per config).

Mechanism: PJRT ``compiler_options`` via the ``MMC_COMPILER_OPTIONS`` env var
(utils/xla_options.py), NOT ``XLA_FLAGS`` — measured fact on the axon relay:
XLA_FLAGS is parsed by the LOCAL process whose CPU-only registry hard-aborts
on any ``--xla_tpu_*`` name, while compiler_options travel inside the compile
request and are validated by the REMOTE compiler (a bogus name errors
remotely, so accepted options are real). compiler_options also work on
ordinary TPU hosts, so the harness is portable.

Usage:
  python scripts/sweep_xla_flags.py serve        # eval path @ batch 64
  python scripts/sweep_xla_flags.py train        # bench.py train step
  python scripts/sweep_xla_flags.py serve --sets baseline,lhs
  python scripts/sweep_xla_flags.py serve --extra "xla_foo=1" --name foo

Each run prints the benchmark's own JSON lines tagged with the set name;
a final table compares the headline number (memes/s for train, batch-64
throughput for serve). Expect ~3-8 min of remote compile per NEW option set
on the relay; re-runs of a set hit its cache dir.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Candidate sets (key=value[,key=value] — parsed by utils/xla_options.py).
# Unknown/renamed options make the child fail fast at its first compile — the
# sweep reports the failure and moves on. Rationale per set:
#   lhs        — latency-hiding scheduler: overlaps weight DMA with compute;
#                directly targets "weight-prefetch gaps" in the eval profile.
#   vmem64/128 — larger scoped VMEM lets the fusion scheduler double-buffer
#                bigger matmul tiles (default is conservative).
#   lhs_vmem64 — both of the above.
FLAG_SETS = {
    "baseline": "",
    "lhs": "xla_tpu_enable_latency_hiding_scheduler=true",
    "vmem64": "xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem128": "xla_tpu_scoped_vmem_limit_kib=131072",
    "lhs_vmem64": ("xla_tpu_enable_latency_hiding_scheduler=true,"
                   "xla_tpu_scoped_vmem_limit_kib=65536"),
}


def run_one(mode: str, name: str, flags: str, timeout_s: int) -> list:
    env = dict(os.environ)
    if flags:
        env["MMC_COMPILER_OPTIONS"] = flags
    else:
        env.pop("MMC_COMPILER_OPTIONS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/jax_cache_sweep_{name}"
    if mode == "serve":
        cmd = [sys.executable, os.path.join(ROOT, "scripts", "bench_serving.py")]
        env.setdefault("SERVING_PATHS", "bf16")
        env.setdefault("SERVING_BATCHES", "64")
    else:
        cmd = [sys.executable, os.path.join(ROOT, "bench.py")]
    print(f"== [{name}] MMC_COMPILER_OPTIONS='{flags}'", file=sys.stderr, flush=True)
    try:
        proc = subprocess.run(cmd, env=env, cwd=ROOT, capture_output=True,
                              text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"== [{name}] TIMEOUT after {timeout_s}s", file=sys.stderr)
        return []
    sys.stderr.write(proc.stderr[-2000:])
    rows = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            rec["flag_set"] = name
            rows.append(rec)
            print(json.dumps(rec), flush=True)
    if proc.returncode != 0 and not rows:
        print(f"== [{name}] FAILED rc={proc.returncode}", file=sys.stderr)
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["serve", "train"])
    ap.add_argument("--sets", default=",".join(FLAG_SETS),
                    help="comma-separated subset of: " + ",".join(FLAG_SETS))
    ap.add_argument("--extra", default=None,
                    help="ad-hoc flag string to run as its own set")
    ap.add_argument("--name", default="extra", help="name for --extra")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()

    sets = {n: FLAG_SETS[n] for n in args.sets.split(",") if n in FLAG_SETS}
    if args.extra is not None:
        sets[args.name] = args.extra

    results = []
    for name, flags in sets.items():
        results += run_one(args.mode, name, flags, args.timeout)

    if results:
        print("\n== summary ==", file=sys.stderr)
        for r in results:
            if "memes_per_sec" in r:  # bench_serving row
                label = f"{r.get('path', '?')}@{r.get('batch_size', '?')}"
                val, unit = r["memes_per_sec"], "memes/s"
            else:  # bench.py row
                label, val, unit = "train", r.get("value"), r.get("unit", "")
            print(f"{r['flag_set']:>12}  {label:<12} {val} {unit}",
                  file=sys.stderr)
    return 0 if results else 1


if __name__ == "__main__":
    raise SystemExit(main())
