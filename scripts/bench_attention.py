"""Attention implementation A/B microbench on the live backend.

Compares, at a grid of sequence lengths:
  - xla      : jnp einsum chain (the measured default at flagship shapes)
  - pallas   : resident full-scores kernel (seq <= 512)
  - flash    : tiled online-softmax kernel (seq <= 8192)

Both eval (forward) and train (forward+backward, with dropout for the
kernels that support it) are timed. Timing windows end with a host value
fetch (the axon relay's block_until_ready can return early).

Usage:  JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache python scripts/bench_attention.py
        SEQS=512,1024,2048 BATCH=8 HEADS=16 DHEAD=64 python scripts/bench_attention.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multimodal_classification_tpu.ops.attention import _attention_xla
from multimodal_classification_tpu.ops.pallas_kernels import attention as pk
from multimodal_classification_tpu.ops.pallas_kernels import flash_attention as fk

SEQS = [int(s) for s in os.environ.get("SEQS", "128,256,512,1024,2048").split(",")]
B = int(os.environ.get("BATCH", 8))
H = int(os.environ.get("HEADS", 16))
D = int(os.environ.get("DHEAD", 64))
STEPS = int(os.environ.get("STEPS", 20))
RATE = float(os.environ.get("RATE", 0.1))


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # warm + sync
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / STEPS * 1e3


def main():
    key = jax.random.key(0)
    dkey = jax.random.key(1)
    print(f"backend={jax.devices()[0].platform} B={B} H={H} D={D} steps={STEPS}")
    header = f"{'seq':>5} | {'mode':<5} | {'xla':>8} | {'pallas':>8} | {'flash':>8}  (ms)"
    print(header)
    print("-" * len(header))
    for s in SEQS:
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (B, H, s, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, H, s, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, H, s, D), jnp.bfloat16)

        impls = {
            "xla": jax.jit(lambda q, k, v: _attention_xla(q, k, v, None, 0.0, None)),
            "pallas": jax.jit(lambda q, k, v: pk.fused_attention(q, k, v, None))
            if pk.supports(q, k, v, None) else None,
            "flash": jax.jit(lambda q, k, v: fk.flash_attention(q, k, v, None))
            if fk.supports(q, k, v, None) else None,
        }
        row = {n: f"{timeit(f, q, k, v):8.2f}" if f else "     n/a"
               for n, f in impls.items()}
        print(f"{s:>5} | {'eval':<5} | {row['xla']} | {row['pallas']} | {row['flash']}")

        def train_loss(attn):
            def loss(q, k, v):
                return jnp.sum(attn(q, k, v).astype(jnp.float32) ** 2)
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        impls_t = {
            "xla": train_loss(lambda q, k, v: _attention_xla(q, k, v, None, RATE, dkey)),
            "pallas": train_loss(lambda q, k, v: pk.fused_attention(q, k, v, None, RATE, dkey))
            if pk.supports(q, k, v, None) else None,
            "flash": train_loss(lambda q, k, v: fk.flash_attention(q, k, v, None, RATE, dkey))
            if fk.supports(q, k, v, None) else None,
        }
        row = {n: f"{timeit(f, q, k, v):8.2f}" if f else "     n/a"
               for n, f in impls_t.items()}
        print(f"{s:>5} | {'train':<5} | {row['xla']} | {row['pallas']} | {row['flash']}")


if __name__ == "__main__":
    main()
