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
    dropout_rng: Optional[jax.Array] = None,
) -> Optional[Callable[[], jnp.ndarray]]:
    """Return a thunk computing fused attention, or None to use the XLA path.

    Serves training too: attention-prob dropout is applied inside the kernel
    (bits drawn from ``dropout_rng``), and gradients come from the fused
    backward kernel.
    """
    if not on_tpu():
        return None
    if dropout_rate > 0.0 and dropout_rng is None:
        return None
    from multimodal_classification_tpu.ops.pallas_kernels import attention as attn_k

    if attn_k.supports(q, k, v, bias):
        return lambda: attn_k.fused_attention(q, k, v, bias, dropout_rate, dropout_rng)

    # Beyond the resident kernel's MAX_SEQ, the flash-style tiling takes over
    # (measured: the resident kernel already beats XLA at seq 512; flash lifts
    # the ceiling to MAX_SEQ=8192 for long-sequence configs).
    from multimodal_classification_tpu.ops.pallas_kernels import flash_attention as flash_k

    if flash_k.supports(q, k, v, bias):
        return lambda: flash_k.flash_attention(q, k, v, bias, dropout_rate, dropout_rng)
    return None


def maybe_fused_ffn(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
) -> Optional[Callable[[], jnp.ndarray]]:
    """Return a thunk computing ``gelu(x@W1+b1)@W2+b2`` in one VMEM-resident
    Pallas pass (the intermediate never touches HBM), or None for the
    unfused XLA path (wrong platform, lane-misaligned dims, or weights too
    large for the VMEM budget)."""
    if not on_tpu():
        return None
    from multimodal_classification_tpu.ops.pallas_kernels import fused_ffn as ffn_k

    h, i = w1.shape
    if x.shape[-1] != h or w2.shape != (i, h):
        return None
    if not ffn_k.supported(h, i, x.dtype):
        return None
    return lambda: ffn_k.fused_ffn(x, w1, b1, w2, b2)


def maybe_fused_ffn_train(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    dropout_rate: float,
    dropout_rng: Optional[jax.Array],
) -> Optional[Callable[[], jnp.ndarray]]:
    """TRAINING twin of :func:`maybe_fused_ffn` covering the whole FFN
    residual block ``LN(x + dropout(ffn(x)))``: forward in one Pallas pass
    (in-kernel counter-hash dropout), backward in one Pallas pass + two XLA
    weight-gradient matmuls (custom_vjp). None → unfused XLA path (wrong
    platform, lane-misaligned dims, weights over the VMEM budget — the
    visual 1024/4096 stream — or dropout without an rng)."""
    if not on_tpu():
        return None
    if dropout_rate > 0.0 and dropout_rng is None:
        return None
    from multimodal_classification_tpu.ops.pallas_kernels import (
        fused_ffn_train as ffn_t,
    )

    h, i = w1.shape
    if x.shape[-1] != h or w2.shape != (i, h):
        return None
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if not ffn_t.supported_train(h, i, x.dtype, rows=rows):
        return None
    return lambda: ffn_t.fused_ffn_block_train(
        x, w1, b1, w2, b2, gamma, beta, dropout_rate, dropout_rng
    )


def maybe_fused_ffn_int8(
    x: jnp.ndarray,
    q1: jnp.ndarray,
    s1: jnp.ndarray,
    b1: jnp.ndarray,
    q2: jnp.ndarray,
    s2: jnp.ndarray,
    b2: jnp.ndarray,
) -> Optional[Callable[[], jnp.ndarray]]:
    """Int8 twin of :func:`maybe_fused_ffn` for layers the serving int8 path
    quantized offline: both dots run on the int8 MXU with the int8 weight
    matrices VMEM-resident (half the bf16 bytes) and per-row activation
    scales computed in-kernel. None → unfused int8 XLA path."""
    if not on_tpu():
        return None
    from multimodal_classification_tpu.ops.pallas_kernels import fused_ffn as ffn_k

    h, i = q1.shape
    if x.shape[-1] != h or q2.shape != (i, h):
        return None
    if not ffn_k.supported_int8(h, i, x.dtype):
        return None
    return lambda: ffn_k.fused_ffn_int8(x, q1, s1, b1, q2, s2, b2)


def maybe_fused_bi_attention(
    q1, kv1, q2, kv2, bias1, bias2, dropout_rate: float, dropout_rngs=None
) -> Optional[Callable[[], tuple]]:
    """Fused both-direction co-attention (training included), or None for
    the XLA path."""
    if not on_tpu():
        return None
    if dropout_rate > 0.0 and dropout_rngs is None:
        return None
    from multimodal_classification_tpu.ops.pallas_kernels import bi_attention as bk

    k2, v2 = kv1
    k1, v1 = kv2
    if not bk.supports(q1, k2, v2, q2, k1, v1):
        return None
    return lambda: bk.fused_bi_attention(
        q1, k2, v2, q2, k1, v1, bias1, bias2, dropout_rate, dropout_rngs
    )


def maybe_fused_attn_block(
    x3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta, num_heads: int
) -> Optional[Callable[[], jnp.ndarray]]:
    """Whole post-LN self-attention block (q/k/v/out projections + masked
    softmax attention + residual LayerNorm) in one VMEM-resident Pallas pass,
    or None for the unfused XLA path. Eval-path only (the caller gates on
    deterministic); see fused_attn_block.py for the dispatch-shape rules."""
    if not on_tpu():
        return None
    from multimodal_classification_tpu.ops.pallas_kernels import (
        fused_attn_block as ab_k,
    )

    b, s, hd = x3.shape
    if wq.shape != (hd, hd) or not ab_k.supported(b, s, hd, num_heads, x3.dtype):
        return None
    return lambda: ab_k.fused_attn_block(
        x3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta, num_heads
    )


def maybe_fused_attn_block_train(
    x3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta,
    num_heads: int, rate_attn: float, rate_hidden: float,
    dropout_rng: Optional[jax.Array],
) -> Optional[Callable[[], jnp.ndarray]]:
    """TRAINING twin of :func:`maybe_fused_attn_block`: whole post-LN
    attention sub-block with in-kernel counter-hash dropouts in one Pallas
    forward and a fused Pallas backward (single-pass for 768-d text, two-
    pass split for the 1024-d visual stream) + four XLA weight-gradient
    matmuls (custom_vjp). None → unfused XLA path (wrong platform,
    unsupported shapes, or dropout without an rng)."""
    if not on_tpu():
        return None
    if (rate_attn > 0.0 or rate_hidden > 0.0) and dropout_rng is None:
        return None
    from multimodal_classification_tpu.ops.pallas_kernels import (
        fused_attn_block_train as ab_t,
    )

    b, s, hd = x3.shape
    if wq.shape != (hd, hd) or not ab_t.supported_train(
        b, s, hd, num_heads, x3.dtype
    ):
        return None
    return lambda: ab_t.fused_attn_block_train(
        x3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta,
        num_heads, rate_attn, rate_hidden, dropout_rng,
    )


def maybe_fused_attn_block_int8(
    x3, key_bias, qq, sq, bq, qk, sk, bk, qv, sv, bv, qo, so, bo,
    gamma, beta, num_heads: int
) -> Optional[Callable[[], jnp.ndarray]]:
    """Int8 twin of :func:`maybe_fused_attn_block` for serving-int8-quantized
    layers: all four projections on the int8 MXU with int8 weights resident,
    the input block row-quantized ONCE for q/k/v."""
    if not on_tpu():
        return None
    from multimodal_classification_tpu.ops.pallas_kernels import (
        fused_attn_block as ab_k,
    )

    b, s, hd = x3.shape
    if qq.shape != (hd, hd) or not ab_k.supported(
        b, s, hd, num_heads, x3.dtype, int8=True
    ):
        return None
    return lambda: ab_k.fused_attn_block_int8(
        x3, key_bias, qq, sq, bq, qk, sk, bk, qv, sv, bv, qo, so, bo,
        gamma, beta, num_heads
    )


def maybe_fused_co_dir(
    xq3, xkv3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta,
    num_heads: int
) -> Optional[Callable[[], jnp.ndarray]]:
    """One co-attention direction (q/k/v/out projections + masked
    cross-attention + residual LayerNorm) in one VMEM-resident Pallas pass,
    or None for the unfused XLA path. Eval only (caller gates)."""
    if not on_tpu():
        return None
    from multimodal_classification_tpu.ops.pallas_kernels import (
        fused_co_block as co_k,
    )

    _, sq, hq = xq3.shape
    _, sk, hkv = xkv3.shape
    bi = wq.shape[1]
    if wq.shape[0] != hq or wk.shape != (hkv, bi) or wo.shape != (bi, hq):
        return None
    if not co_k.supported_co(sq, sk, hq, hkv, bi, num_heads, xq3.dtype):
        return None
    return lambda: co_k.fused_co_dir(
        xq3, xkv3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta,
        num_heads
    )


def maybe_fused_co_dir_int8(
    xq3, xkv3, key_bias, qq, sq_, bq, qk, sk_, bk, qv, sv_, bv,
    qo, so_, bo, gamma, beta, num_heads: int
) -> Optional[Callable[[], jnp.ndarray]]:
    """Int8 twin of :func:`maybe_fused_co_dir`."""
    if not on_tpu():
        return None
    from multimodal_classification_tpu.ops.pallas_kernels import (
        fused_co_block as co_k,
    )

    _, sq, hq = xq3.shape
    _, sk, hkv = xkv3.shape
    bi = qq.shape[1]
    if qq.shape[0] != hq or qk.shape != (hkv, bi) or qo.shape != (bi, hq):
        return None
    if not co_k.supported_co(sq, sk, hq, hkv, bi, num_heads, xq3.dtype,
                             int8=True):
        return None
    return lambda: co_k.fused_co_dir_int8(
        xq3, xkv3, key_bias, qq, sq_, bq, qk, sk_, bk, qv, sv_, bv,
        qo, so_, bo, gamma, beta, num_heads
    )


def maybe_fused_layer_int8(
    x3, key_bias, qq, sq, bq, qk, sk, bk, qv, sv, bv, qo, so, bo,
    g1, b1, q1, s1, bf1, q2, s2, bf2, g2, b2, num_heads: int
) -> Optional[Callable[[], jnp.ndarray]]:
    """Whole int8 transformer LAYER (attention block + FFN + residual LN)
    in ONE VMEM-resident Pallas pass, or None for the two-kernel path.
    Text layers only (the six int8 weight matrices of the 768/3072 shape
    fit VMEM; the visual 1024/4096 shape is refused by the budget). Eval
    only (caller gates on deterministic); int8-only (the bf16 weight set
    does not fit VMEM — the float path keeps attn-block + FFN kernels)."""
    if not on_tpu():
        return None
    from multimodal_classification_tpu.ops.pallas_kernels import (
        fused_layer as fl_k,
    )

    b, s, hd = x3.shape
    if qq.shape != (hd, hd) or q1.shape[0] != hd or q2.shape[1] != hd:
        return None
    if not fl_k.supported_layer(b, s, hd, q1.shape[1], num_heads, x3.dtype):
        return None
    return lambda: fl_k.fused_layer_int8(
        x3, key_bias, qq, sq, bq, qk, sk, bk, qv, sv, bv, qo, so, bo,
        g1, b1, q1, s1, bf1, q2, s2, bf2, g2, b2, num_heads
    )
