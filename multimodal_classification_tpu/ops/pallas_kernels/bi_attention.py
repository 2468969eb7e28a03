"""Fused bidirectional co-attention Pallas kernel.

ViLBERT's cross-modal BiAttention computes two attentions over the *same* six
projection tensors — visual-queries→text-K/V and text-queries→visual-K/V
(reference: vilbert_facebook_arch.py:253-294). Fusing both directions into
one grid program per (batch, head) keeps all six tensors and both score
matrices resident in VMEM for a single pass: half the kernel launches and no
HBM round-trip between the directions. Sequences are ≤ a few hundred tokens,
so everything fits comfortably (SURVEY.md §5).

Gradients: custom VJP recomputing through the XLA reference
(ops.attention.bi_attention_core semantics), like the single-direction kernel.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANE = 8
MAX_SEQ = 2048


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supports(q1, k2, v2, q2, k1, v1) -> bool:
    if any(t.ndim != 4 for t in (q1, k2, v2, q2, k1, v1)):
        return False
    b, h, s1, d = q1.shape
    s2 = q2.shape[2]
    if s1 > MAX_SEQ or s2 > MAX_SEQ or d > 256:
        return False
    return (
        k1.shape == (b, h, s1, d) and v1.shape == (b, h, s1, d)
        and q2.shape == (b, h, s2, d)
        and k2.shape == (b, h, s2, d) and v2.shape == (b, h, s2, d)
    )


def _kernel(q1_ref, k2_ref, v2_ref, q2_ref, k1_ref, v1_ref, b1_ref, b2_ref,
            o1_ref, o2_ref, *, scale: float):
    q1 = q1_ref[0, 0].astype(jnp.float32)
    k2 = k2_ref[0, 0].astype(jnp.float32)
    v2 = v2_ref[0, 0].astype(jnp.float32)
    q2 = q2_ref[0, 0].astype(jnp.float32)
    k1 = k1_ref[0, 0].astype(jnp.float32)
    v1 = v1_ref[0, 0].astype(jnp.float32)

    def one(q, k, v, bias):
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        return jnp.dot(p, v, preferred_element_type=jnp.float32)

    o1_ref[0, 0] = one(q1, k2, v2, b1_ref[0, 0].astype(jnp.float32)).astype(o1_ref.dtype)
    o2_ref[0, 0] = one(q2, k1, v1, b2_ref[0, 0].astype(jnp.float32)).astype(o2_ref.dtype)


@jax.custom_vjp
def fused_bi_attention(q1, k2, v2, q2, k1, v1, bias1, bias2):
    """(ctx1 [B,H,S1,D], ctx2 [B,H,S2,D]): direction-1 = q1 over (k2, v2)
    with additive ``bias1`` [B,1,1,S2]-broadcastable; direction-2 = q2 over
    (k1, v1) with ``bias2`` over S1."""
    return _forward(q1, k2, v2, q2, k1, v1, bias1, bias2)


def _pad_seq(x, target):
    s = x.shape[2]
    if s == target:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, target - s), (0, 0)))


def _full_bias(bias, b, h, sq, skv, sq_p, skv_p, dtype):
    if bias is None:
        bias = jnp.zeros((1, 1, 1, skv), jnp.float32)
    bias = jnp.broadcast_to(bias.astype(jnp.float32), (b, h, sq, skv))
    return jnp.pad(
        bias, ((0, 0), (0, 0), (0, sq_p - sq), (0, skv_p - skv)),
        constant_values=-1e9,
    )


def _forward(q1, k2, v2, q2, k1, v1, bias1, bias2):
    b, h, s1, d = q1.shape
    s2 = q2.shape[2]
    scale = 1.0 / (d ** 0.5)
    s1p, s2p = _round_up(s1, _SUBLANE), _round_up(s2, _SUBLANE)

    q1p, k1p, v1p = (_pad_seq(t, s1p) for t in (q1, k1, v1))
    q2p, k2p, v2p = (_pad_seq(t, s2p) for t in (q2, k2, v2))
    b1 = _full_bias(bias1, b, h, s1, s2, s1p, s2p, q1.dtype)  # [B,H,S1p,S2p]
    b2 = _full_bias(bias2, b, h, s2, s1, s2p, s1p, q2.dtype)  # [B,H,S2p,S1p]

    def spec(sq, sd):
        return pl.BlockSpec((1, 1, sq, sd), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)

    out1, out2 = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(b, h),
        in_specs=[
            spec(s1p, d), spec(s2p, d), spec(s2p, d),
            spec(s2p, d), spec(s1p, d), spec(s1p, d),
            spec(s1p, s2p), spec(s2p, s1p),
        ],
        out_specs=(spec(s1p, d), spec(s2p, d)),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s1p, d), v2.dtype),
            jax.ShapeDtypeStruct((b, h, s2p, d), v1.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s1p * s2p * d * 2,
            bytes_accessed=sum(t.size * t.dtype.itemsize
                               for t in (q1p, k1p, v1p, q2p, k2p, v2p)),
            transcendentals=2 * b * h * s1p * s2p,
        ),
    )(q1p, k2p, v2p, q2p, k1p, v1p, b1, b2)
    return out1[:, :, :s1], out2[:, :, :s2]


def _ref(q1, k2, v2, q2, k1, v1, bias1, bias2):
    from multimodal_classification_tpu.ops.attention import _attention_xla

    return (
        _attention_xla(q1, k2, v2, bias1, 0.0, None),
        _attention_xla(q2, k1, v1, bias2, 0.0, None),
    )


def _fwd(q1, k2, v2, q2, k1, v1, bias1, bias2):
    return _forward(q1, k2, v2, q2, k1, v1, bias1, bias2), (
        q1, k2, v2, q2, k1, v1, bias1, bias2,
    )


def _bwd(res, g):
    q1, k2, v2, q2, k1, v1, bias1, bias2 = res
    _, vjp = jax.vjp(
        lambda a, b_, c, d_, e, f: _ref(a, b_, c, d_, e, f, bias1, bias2),
        q1, k2, v2, q2, k1, v1,
    )
    grads = vjp(g)
    return (*grads, None, None)


fused_bi_attention.defvjp(_fwd, _bwd)
