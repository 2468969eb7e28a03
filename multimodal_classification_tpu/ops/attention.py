"""Attention cores.

The reference's self/co/bi attention are unfused matmul-softmax chains in
torch (reference: models/vilbert_core.py:61-145, models/vilbert_facebook_arch.py:253-294).
Here the core is a single function with two interchangeable implementations:

- ``impl="xla"``  — jnp einsum chain; XLA fuses scale+bias+softmax into the
  matmuls. Reference implementation for parity tests; also the CPU path.
- ``impl="pallas"`` — fused Pallas TPU kernel (ops/pallas_kernels/attention.py)
  that keeps Q·Kᵀ scores in VMEM and never materialises them in HBM.

``impl="auto"`` picks Pallas on TPU when shapes are kernel-compatible.

Softmax always accumulates in float32 regardless of activation dtype.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # additive mask value (reference uses -10000; -1e9 is safer in bf16→fp32 softmax)


def mask_to_bias(mask: Optional[jnp.ndarray], dtype=jnp.float32) -> Optional[jnp.ndarray]:
    """[B, S] {0,1} mask → additive [B, 1, 1, S] bias
    (reference: vilbert_facebook_arch.py:530-540 uses (1-m)·(−10000))."""
    if mask is None:
        return None
    return ((1.0 - mask.astype(dtype)) * NEG_INF)[:, None, None, :]


def _attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    dropout_rate: float,
    dropout_rng: Optional[jax.Array],
) -> jnp.ndarray:
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Scaled dot-product attention.

    Args:
      q: [B, H, Sq, D]; k, v: [B, H, Skv, D].
      bias: additive float bias broadcastable to [B, H, Sq, Skv] (0 / −1e9).
      impl: "xla" | "pallas" | "auto".
    Returns: [B, H, Sq, D] in v.dtype.
    """
    if impl in ("pallas", "auto"):
        from multimodal_classification_tpu.ops import pallas_kernels

        fn = pallas_kernels.maybe_fused_attention(
            q, k, v, bias, dropout_rate, dropout_rng
        )
        if fn is not None:
            return fn()
        if impl == "pallas":
            raise ValueError(
                f"No Pallas attention kernel for shapes q={q.shape} k={k.shape}"
            )
    return _attention_xla(q, k, v, bias, dropout_rate, dropout_rng)


def bi_attention_core(
    q1: jnp.ndarray,
    kv1: Tuple[jnp.ndarray, jnp.ndarray],
    q2: jnp.ndarray,
    kv2: Tuple[jnp.ndarray, jnp.ndarray],
    bias1: Optional[jnp.ndarray] = None,
    bias2: Optional[jnp.ndarray] = None,
    *,
    dropout_rate: float = 0.0,
    dropout_rngs: Optional[Tuple[jax.Array, jax.Array]] = None,
    impl: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional cross-attention: stream-1 queries attend over stream-2
    keys/values and vice versa, in one call so the fused kernel can share
    VMEM residency of both streams
    (reference math: vilbert_facebook_arch.py:253-294 BiAttention.forward).

    q1 attends over kv1 (the *other* stream's K/V), q2 over kv2.
    """
    if impl in ("pallas", "auto"):
        from multimodal_classification_tpu.ops import pallas_kernels

        fn = pallas_kernels.maybe_fused_bi_attention(
            q1, kv1, q2, kv2, bias1, bias2, dropout_rate, dropout_rngs
        )
        if fn is not None:
            return fn()
    rng1 = rng2 = None
    if dropout_rngs is not None:
        rng1, rng2 = dropout_rngs
    ctx1 = attention_core(
        q1, kv1[0], kv1[1], bias1, dropout_rate=dropout_rate, dropout_rng=rng1, impl=impl
    )
    ctx2 = attention_core(
        q2, kv2[0], kv2[1], bias2, dropout_rate=dropout_rate, dropout_rng=rng2, impl=impl
    )
    return ctx1, ctx2


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, S, H*D] → [B, H, S, D]."""
    b, s, hd = x.shape
    return x.reshape(b, s, num_heads, hd // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, S, D] → [B, S, H*D]."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)
