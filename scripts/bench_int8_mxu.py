"""Does the Mosaic int8 dot actually run at the v5e int8 MXU rate?

The batch-112 record-config profile (scripts/profile_eval.py 112 int8 32)
puts EVERY int8 Pallas kernel at a uniform ~45-57% of the 394-TOPS int8
roofline — text layers 45%, visual layers 50%, co-attention directions
~50%, FFNs 50-57%. A uniform ratio across such different shapes suggests a
systematic cause rather than per-kernel inefficiency: hypothesis (a) the
int8*int8->int32 ``jax.lax.dot_general`` Mosaic emits runs the MXU at the
bf16 rate (197 TFLOP/s), making ~50% of the "int8 roofline" actually ~100%
of the achievable rate; hypothesis (b) the MXU doubles for int8 and the
kernels leave real time on the table (VPU epilogues, pipeline bubbles).

This times a LONE Pallas matmul — a grid over row blocks with the weight
VMEM-resident, no quantization/epilogue at all — in int8 and in bf16 at
the same [K,N], plus the XLA-level int8 dot for reference. One call does
hundreds of blocks (multi-ms of MXU work) so relay dispatch overhead is
noise. int8/bf16 time ratio ~0.5 => (b); ~1.0 => (a).

Usage: JAX_COMPILATION_CACHE_DIR=... python scripts/bench_int8_mxu.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PEAK_BF16 = 197e12
PEAK_INT8 = 394e12

M, K, N = 131072, 2048, 2048  # 5.5e11 flops/call: 1.4 ms @int8 peak, 2.8 @bf16
BLK = 256                     # rows per program; w [K,N] resident (bf16 w is
                              # 8 MB — BLK 512 OOMs the 16 MB scoped vmem)

# SWEEP=1: lone int8 matmuls at the serving kernels' exact (row-block, K, N)
# operand shapes — each row's TOP/s is that shape's EMPIRICAL ceiling, the
# honest denominator for the per-kernel roofline table in PERFORMANCE.md.
SWEEP_SHAPES = [
    # (blk, K, N)      serving kernel that issues this dot
    (128, 768, 768),   # fused text layer r=128: q/k/v/out projections
    (128, 768, 3072),  # fused text layer: FFN up
    (128, 3072, 768),  # fused text layer: FFN down
    (256, 768, 768),   # hypothetical r=256 text layer
    (448, 1024, 1024),  # visual attn-block / FFN r=448 (bb=4 x s_p=112)
    (256, 2048, 2048),  # the big control from the A/B above
    (512, 2048, 2048),  # does a bigger row block lift the ceiling?
]


def _kernel(x_ref, w_ref, o_ref, *, acc_t):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_t,
    ).astype(o_ref.dtype)


def make_pallas(in_dtype, acc_t, m, k, n, blk):
    return pl.pallas_call(
        functools.partial(_kernel, acc_t=acc_t),
        grid=(m // blk,),
        in_specs=[
            pl.BlockSpec((blk, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * jnp.dtype(in_dtype).itemsize
            + k * n * jnp.dtype(in_dtype).itemsize + m * n * 2,
            transcendentals=0,
        ),
    )


def bench(label, fn, x, w, peak, flops) -> dict:
    r = 8
    out = fn(x, w)
    _ = float(out[0, 0])  # compile + warm
    best = None
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(r):
            out = fn(x, w)
        _ = float(out[0, 0])
        dt = (time.perf_counter() - t0) / r
        best = dt if best is None else min(best, dt)
    tops = flops / best / 1e12
    print(f"{label:<26} {best * 1e3:8.3f} ms/call  {tops:7.1f} TOP/s  "
          f"{100 * tops * 1e12 / peak:5.1f}% of {peak / 1e12:.0f}T",
          flush=True)
    return {"label": label, "ms": best * 1e3, "tops": tops}


def run_sweep(rng) -> int:
    print(f"{'shape (blk,K,N)':<26} {'ms/call':>15}  {'TOP/s':>7}")
    for blk, k, n in SWEEP_SHAPES:
        m = (131072 // blk) * blk  # several hundred programs per call
        x8 = jnp.asarray(rng.integers(-127, 127, (m, k), dtype=np.int8))
        w8 = jnp.asarray(rng.integers(-127, 127, (k, n), dtype=np.int8))
        fn = jax.jit(make_pallas(jnp.int8, jnp.int32, m, k, n, blk))
        bench(f"int8 blk{blk} [{k}x{n}]", fn, x8, w8, PEAK_INT8,
              2.0 * m * k * n)
    return 0


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind}", file=sys.stderr)
    rng = np.random.default_rng(0)
    if os.environ.get("SWEEP"):
        return run_sweep(rng)
    x8 = jnp.asarray(rng.integers(-127, 127, (M, K), dtype=np.int8))
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
    xb = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)

    p8 = jax.jit(make_pallas(jnp.int8, jnp.int32, M, K, N, BLK))
    pb = jax.jit(make_pallas(jnp.bfloat16, jnp.float32, M, K, N, BLK))

    @jax.jit
    def xla8(x, w):
        acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.bfloat16)

    @jax.jit
    def xlab(x, w):
        return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16)

    flops = 2.0 * M * K * N
    r_b = bench("pallas bf16->f32", pb, xb, wb, PEAK_BF16, flops)
    r_8 = bench("pallas int8->int32", p8, x8, w8, PEAK_INT8, flops)
    bench("xla bf16->f32", xlab, xb, wb, PEAK_BF16, flops)
    bench("xla int8->int32", xla8, x8, w8, PEAK_INT8, flops)
    ratio = r_8["ms"] / r_b["ms"]
    print(f"int8/bf16 time ratio: {ratio:.2f} (nominal would be 0.50; "
          f"measured 2026-08-19: 0.66 — the empirical int8 ceiling is "
          f"~1.5x bf16, not 2x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
