"""MXU microbench: what MFU does a LONE dense op reach at the eval shapes?

The batch-64 eval profile shows ~55-57% of the dot-fusion roofline
(scripts/analyze_eval_hlo.py: 15.7 ms ideal vs 27.5 ms measured). Two
hypotheses: (a) XLA leaves scheduling/prefetch gaps between the ~212 small
fusions, or (b) a single matmul of these shapes simply can't saturate the
v5e MXU. This script times isolated jitted matmuls (with the same
bias-add epilogue XLA fuses) at the eval step's exact shapes and prints
achieved TFLOP/s vs the 197 TFLOP/s bf16 peak — separating (a) from (b).

Each timed op is iterated K times inside one compiled lax.scan with a
data dependency (output feeds the next iteration's input through a cheap
projection) so dispatch latency and the relay don't pollute the number.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache python scripts/bench_matmul.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12
K_ITERS = int(os.environ.get("ITERS", 50))

# (label, M, K, N) — the eval step's dominant dense shapes at batch 64:
#   text FFN down  [64*128, 3072] x [3072, 768]
#   text FFN up    [64*128, 768]  x [768, 3072]
#   text QKV/out   [64*128, 768]  x [768, 768]
#   visual FFN     [64*100, 1024] x [1024, 1024]
#   visual embed   [64*100, 2048] x [2048, 1024]
#   big-M control  [16384, 3072]  x [3072, 3072]  (should be near peak)
SHAPES = [
    ("ffn_down", 8192, 3072, 768),
    ("ffn_up", 8192, 768, 3072),
    ("qkv", 8192, 768, 768),
    ("vis_ffn", 6400, 1024, 1024),
    ("vis_embed", 6400, 2048, 1024),
    ("control_big", 16384, 3072, 3072),
    # the serving-record bucket (seq 32 → 64*32 = 2048 text rows): smaller M
    # amortizes the [K,N] weight streaming over 4× fewer rows — the roofline
    # worsens; these rows quantify how much of the seq-32 eval gap is
    # fundamental weight-bandwidth vs scheduling
    ("ffn_down_s32", 2048, 3072, 768),
    ("ffn_up_s32", 2048, 768, 3072),
    ("qkv_s32", 2048, 768, 768),
]


def bench_unrolled(label: str, m: int, k: int, n: int) -> dict:
    """Time a scan of (w, w_back) matmul pairs at TWO lengths and difference
    them: (T(4L) - T(L)) / (3L pairs) cancels the constant dispatch +
    host-roundtrip overhead of the relay (~29 ms) exactly — only the true
    per-iteration device time remains."""
    key = jax.random.key(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (k, n), jnp.bfloat16) * 0.02
    wb = jax.random.normal(jax.random.key(2), (n, k), jnp.bfloat16) * 0.02

    def make(length):
        def body(carry, _):
            return (carry @ w) @ wb, ()

        @jax.jit
        def run(x0):
            out, _ = jax.lax.scan(body, x0, None, length=length)
            return jnp.sum(out)

        return run

    L = K_ITERS
    run1, run4 = make(L), make(4 * L)
    _ = float(run1(x)); _ = float(run4(x))  # compile + warm
    t1 = min(_timed(run1, x) for _ in range(3))
    t4 = min(_timed(run4, x) for _ in range(3))
    dt = max(t4 - t1, 1e-9)
    n_ops = 2 * 3 * L  # two dots per pair, 3L extra pairs
    flops = 2.0 * m * k * n * n_ops
    tflops = flops / dt / 1e12
    return {
        "label": label,
        "shape": f"[{m},{k}]x[{k},{n}]",
        "ms_per_op": round(dt / n_ops * 1000, 3),
        "tflops": round(tflops, 1),
        "mfu_pct": round(100 * tflops * 1e12 / PEAK_BF16, 1),
    }


def _timed(fn, x) -> float:
    t0 = time.perf_counter()
    _ = float(fn(x))
    return time.perf_counter() - t0


def bench_shape(label: str, m: int, k: int, n: int) -> dict:
    key = jax.random.key(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(key, (k, n), jnp.bfloat16)
    b = jax.random.normal(key, (n,), jnp.bfloat16)
    w_back = jax.random.normal(key, (n, k), jnp.bfloat16) * 0.01
    # the carry round-trips through a second matmul [n,k] so every iteration
    # is pure MXU work with a true data dependency — both dots are counted
    def body(carry, _):
        y = carry @ w + b
        return y @ w_back, ()

    @jax.jit
    def run(x0):
        out, _ = jax.lax.scan(body, x0, None, length=K_ITERS)
        return jnp.sum(out)

    _ = float(run(x))  # compile + warm
    t0 = time.perf_counter()
    v = float(run(x))
    dt = time.perf_counter() - t0
    del v
    flops = 2.0 * m * k * n * 2 * K_ITERS  # two dots per iteration
    tflops = flops / dt / 1e12
    return {
        "label": label,
        "shape": f"[{m},{k}]x[{k},{n}]",
        "ms_per_op": round(dt / (2 * K_ITERS) * 1000, 3),
        "tflops": round(tflops, 1),
        "mfu_pct": round(100 * tflops * 1e12 / PEAK_BF16, 1),
    }


SWEEP = [
    # M sweep at the ffn_down K,N — does time scale with M?
    ("M=2048", 2048, 3072, 768),
    ("M=8192", 8192, 3072, 768),
    ("M=32768", 32768, 3072, 768),
    # N sweep at M=8192, K=3072 — does widening N amortise a fixed cost?
    ("N=768", 8192, 3072, 768),
    ("N=1536", 8192, 3072, 1536),
    ("N=3072", 8192, 3072, 3072),
    # qkv fused-width comparison: 3 x [8192,768]x[768,768] vs 1 x [...,2304]
    ("qkv_1x", 8192, 768, 768),
    ("qkv_3x", 8192, 768, 2304),
]


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind}", file=sys.stderr)
    mode = os.environ.get("MODE", "unrolled")
    fn = bench_unrolled if mode == "unrolled" else bench_shape
    shapes = SWEEP if os.environ.get("SWEEP") else SHAPES
    print(f"mode={mode}")
    print(f"{'label':<14} {'shape':<24} {'ms/op':>8} {'TFLOP/s':>9} {'MFU%':>6}")
    for label, m, k, n in shapes:
        r = fn(label, m, k, n)
        print(f"{r['label']:<14} {r['shape']:<24} {r['ms_per_op']:>8} "
              f"{r['tflops']:>9} {r['mfu_pct']:>6}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
