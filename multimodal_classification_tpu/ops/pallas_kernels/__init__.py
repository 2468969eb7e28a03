"""Pallas TPU kernels (each has a jnp reference twin in ``ops``).

Kernels register themselves here; callers go through ``maybe_*`` helpers that
return None when the kernel does not apply (wrong platform / shapes /
training-time dropout), in which case the XLA reference path runs.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def maybe_fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    dropout_rate: float,
) -> Optional[Callable[[], jnp.ndarray]]:
    """Return a thunk computing fused attention, or None to use the XLA path.

    The fused kernel does not implement attention-prob dropout (train steps
    with dropout>0 use the XLA path, where XLA still fuses well at these tiny
    sequence lengths; the kernel's win is eval/serving).
    """
    if dropout_rate > 0.0 or not on_tpu():
        return None
    from multimodal_classification_tpu.ops.pallas_kernels import attention as attn_k

    if not attn_k.supports(q, k, v, bias):
        return None
    return lambda: attn_k.fused_attention(q, k, v, bias)


def maybe_fused_bi_attention(
    q1, kv1, q2, kv2, bias1, bias2, dropout_rate: float
) -> Optional[Callable[[], tuple]]:
    """Fused both-direction co-attention, or None for the XLA path."""
    if dropout_rate > 0.0 or not on_tpu():
        return None
    from multimodal_classification_tpu.ops.pallas_kernels import bi_attention as bk

    k2, v2 = kv1
    k1, v1 = kv2
    if not bk.supports(q1, k2, v2, q2, k1, v1):
        return None
    return lambda: bk.fused_bi_attention(q1, k2, v2, q2, k1, v1, bias1, bias2)
