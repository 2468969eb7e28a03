"""Fused bidirectional co-attention Pallas kernel — forward AND backward,
with in-kernel dropout.

ViLBERT's cross-modal BiAttention computes two attentions over the *same* six
projection tensors — visual-queries→text-K/V and text-queries→visual-K/V
(reference: vilbert_facebook_arch.py:253-294, incl. per-direction attention
dropout). Fusing both directions into one grid program per (batch, head)
keeps all six tensors and both score matrices resident in VMEM for a single
pass: half the kernel launches and no HBM round-trip between the directions.
Sequences are ≤ a few hundred tokens, so everything fits (SURVEY.md §5).

Training path mirrors ops/pallas_kernels/attention.py: dropout bits come from
``jax.random.bits`` (one hardware-RNG HLO per direction), probabilities and
masks live only in VMEM, and the backward is a fused kernel that recomputes
both score matrices and emits all six input gradients in one pass. Residuals
are just the inputs + keys.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_classification_tpu.ops.pallas_kernels.attention import (
    dropout_bits,
    keep_threshold,
)

_SUBLANE = 8
MAX_SEQ = 512


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


def _softmax_fp32(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _one_fwd(q, k, v, bias, bits, *, scale, thresh, inv_keep):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = _softmax_fp32(s + bias)
    if bits is not None:
        p = jnp.where(bits >= jnp.uint32(thresh), p * inv_keep, 0.0)
    return jnp.dot(p, v, preferred_element_type=jnp.float32)


def _one_bwd(q, k, v, bias, bits, g, *, scale, thresh, inv_keep):
    """Returns (dq, dk, dv) for one direction."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = _softmax_fp32(s + bias)
    if bits is not None:
        keep = bits >= jnp.uint32(thresh)
        pd = jnp.where(keep, p * inv_keep, 0.0)
    else:
        pd = p
    dv = jax.lax.dot_general(
        pd, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dpd = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jnp.where(keep, dpd * inv_keep, 0.0) if bits is not None else dpd
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    return dq, dk, dv


def _fwd_kernel(refs, o1_ref, o2_ref, *, scale, thresh, inv_keep):
    it = iter(refs)
    q1, k2, v2, q2, k1, v1, b1, b2 = (next(it)[0, 0].astype(jnp.float32)
                                      for _ in range(8))
    bits1 = next(it)[0, 0] if thresh is not None else None
    bits2 = next(it)[0, 0] if thresh is not None else None
    o1 = _one_fwd(q1, k2, v2, b1, bits1, scale=scale, thresh=thresh, inv_keep=inv_keep)
    o2 = _one_fwd(q2, k1, v1, b2, bits2, scale=scale, thresh=thresh, inv_keep=inv_keep)
    o1_ref[0, 0] = o1.astype(o1_ref.dtype)
    o2_ref[0, 0] = o2.astype(o2_ref.dtype)


def _bwd_kernel(refs, dq1_ref, dk2_ref, dv2_ref, dq2_ref, dk1_ref, dv1_ref,
                *, scale, thresh, inv_keep):
    it = iter(refs)
    q1, k2, v2, q2, k1, v1, b1, b2 = (next(it)[0, 0].astype(jnp.float32)
                                      for _ in range(8))
    bits1 = next(it)[0, 0] if thresh is not None else None
    bits2 = next(it)[0, 0] if thresh is not None else None
    g1 = next(it)[0, 0].astype(jnp.float32)
    g2 = next(it)[0, 0].astype(jnp.float32)
    dq1, dk2, dv2 = _one_bwd(q1, k2, v2, b1, bits1, g1,
                             scale=scale, thresh=thresh, inv_keep=inv_keep)
    dq2, dk1, dv1 = _one_bwd(q2, k1, v1, b2, bits2, g2,
                             scale=scale, thresh=thresh, inv_keep=inv_keep)
    dq1_ref[0, 0] = dq1.astype(dq1_ref.dtype)
    dk2_ref[0, 0] = dk2.astype(dk2_ref.dtype)
    dv2_ref[0, 0] = dv2.astype(dv2_ref.dtype)
    dq2_ref[0, 0] = dq2.astype(dq2_ref.dtype)
    dk1_ref[0, 0] = dk1.astype(dk1_ref.dtype)
    dv1_ref[0, 0] = dv1.astype(dv1_ref.dtype)


def _pad_seq(x, target):
    s = x.shape[2]
    if s == target:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, target - s), (0, 0)))


def _full_bias(bias, b, h, sq, skv, sq_p, skv_p):
    if bias is None:
        bias = jnp.zeros((1, 1, 1, skv), jnp.float32)
    bias = jnp.broadcast_to(bias.astype(jnp.float32), (b, h, sq, skv))
    return jnp.pad(
        bias, ((0, 0), (0, 0), (0, sq_p - sq), (0, skv_p - skv)),
        constant_values=-1e9,
    )


def _spec(*block):
    return pl.BlockSpec((1, 1, *block), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)


def _prep(q1, k2, v2, q2, k1, v1, bias1, bias2, keys, rate):
    b, h, s1, d = q1.shape
    s2 = q2.shape[2]
    s1p, s2p = _round_up(s1, _SUBLANE), _round_up(s2, _SUBLANE)
    q1p, k1p, v1p = (_pad_seq(t, s1p) for t in (q1, k1, v1))
    q2p, k2p, v2p = (_pad_seq(t, s2p) for t in (q2, k2, v2))
    b1 = _full_bias(bias1, b, h, s1, s2, s1p, s2p)  # [B,H,S1p,S2p]
    b2 = _full_bias(bias2, b, h, s2, s1, s2p, s1p)  # [B,H,S2p,S1p]
    args = [q1p, k2p, v2p, q2p, k1p, v1p, b1, b2]
    specs = [_spec(s1p, d), _spec(s2p, d), _spec(s2p, d),
             _spec(s2p, d), _spec(s1p, d), _spec(s1p, d),
             _spec(s1p, s2p), _spec(s2p, s1p)]
    if rate > 0.0:
        key1, key2 = keys
        bits1 = jnp.pad(dropout_bits(key1, (b, h, s1, s2)),
                        ((0, 0), (0, 0), (0, s1p - s1), (0, s2p - s2)))
        bits2 = jnp.pad(dropout_bits(key2, (b, h, s2, s1)),
                        ((0, 0), (0, 0), (0, s2p - s2), (0, s1p - s1)))
        args += [bits1, bits2]
        specs += [_spec(s1p, s2p), _spec(s2p, s1p)]
    dims = (b, h, s1, s2, s1p, s2p, d)
    return args, specs, dims


def _run_forward(q1, k2, v2, q2, k1, v1, bias1, bias2, keys, rate):
    args, specs, (b, h, s1, s2, s1p, s2p, d) = _prep(
        q1, k2, v2, q2, k1, v1, bias1, bias2, keys, rate
    )
    thresh = keep_threshold(rate) if rate > 0.0 else None
    kernel = functools.partial(
        lambda *a, **kw: _fwd_kernel(a[:-2], a[-2], a[-1], **kw),
        scale=1.0 / (d ** 0.5), thresh=thresh,
        inv_keep=1.0 / (1.0 - rate) if rate > 0.0 else 1.0,
    )
    out1, out2 = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=specs,
        out_specs=(_spec(s1p, d), _spec(s2p, d)),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s1p, d), v2.dtype),
            jax.ShapeDtypeStruct((b, h, s2p, d), v1.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s1p * s2p * d * 2,
            bytes_accessed=sum(a.size * a.dtype.itemsize for a in args[:6]),
            transcendentals=2 * b * h * s1p * s2p,
        ),
    )(*args)
    return out1[:, :, :s1], out2[:, :, :s2]


def _run_backward(q1, k2, v2, q2, k1, v1, bias1, bias2, keys, rate, g1, g2):
    args, specs, (b, h, s1, s2, s1p, s2p, d) = _prep(
        q1, k2, v2, q2, k1, v1, bias1, bias2, keys, rate
    )
    thresh = keep_threshold(rate) if rate > 0.0 else None
    g1 = _pad_seq(g1, s1p)
    g2 = _pad_seq(g2, s2p)
    args += [g1, g2]
    specs += [_spec(s1p, d), _spec(s2p, d)]
    kernel = functools.partial(
        lambda *a, **kw: _bwd_kernel(a[:-6], *a[-6:], **kw),
        scale=1.0 / (d ** 0.5), thresh=thresh,
        inv_keep=1.0 / (1.0 - rate) if rate > 0.0 else 1.0,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=specs,
        out_specs=(_spec(s1p, d), _spec(s2p, d), _spec(s2p, d),
                   _spec(s2p, d), _spec(s1p, d), _spec(s1p, d)),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s1p, d), q1.dtype),
            jax.ShapeDtypeStruct((b, h, s2p, d), k2.dtype),
            jax.ShapeDtypeStruct((b, h, s2p, d), v2.dtype),
            jax.ShapeDtypeStruct((b, h, s2p, d), q2.dtype),
            jax.ShapeDtypeStruct((b, h, s1p, d), k1.dtype),
            jax.ShapeDtypeStruct((b, h, s1p, d), v1.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * s1p * s2p * d * 2,
            bytes_accessed=sum(a.size * a.dtype.itemsize for a in args),
            transcendentals=2 * b * h * s1p * s2p,
        ),
    )(*args)
    dq1, dk2, dv2, dq2, dk1, dv1 = outs
    return (dq1[:, :, :s1], dk2[:, :, :s2], dv2[:, :, :s2],
            dq2[:, :, :s2], dk1[:, :, :s1], dv1[:, :, :s1])


# --- public entry points ----------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def _bi_train(q1, k2, v2, q2, k1, v1, bias1, bias2, key1, key2, rate):
    return _run_forward(q1, k2, v2, q2, k1, v1, bias1, bias2, (key1, key2), rate)


def _bi_train_fwd(q1, k2, v2, q2, k1, v1, bias1, bias2, key1, key2, rate):
    out = _run_forward(q1, k2, v2, q2, k1, v1, bias1, bias2, (key1, key2), rate)
    return out, (q1, k2, v2, q2, k1, v1, bias1, bias2, key1, key2)


def _bi_train_bwd(rate, res, g):
    q1, k2, v2, q2, k1, v1, bias1, bias2, key1, key2 = res
    g1, g2 = g
    grads = _run_backward(q1, k2, v2, q2, k1, v1, bias1, bias2,
                          (key1, key2), rate, g1, g2)
    return (*grads, None, None, None, None)


_bi_train.defvjp(_bi_train_fwd, _bi_train_bwd)


@jax.custom_vjp
def _bi_eval(q1, k2, v2, q2, k1, v1, bias1, bias2):
    return _run_forward(q1, k2, v2, q2, k1, v1, bias1, bias2, None, 0.0)


def _bi_eval_fwd(q1, k2, v2, q2, k1, v1, bias1, bias2):
    out = _run_forward(q1, k2, v2, q2, k1, v1, bias1, bias2, None, 0.0)
    return out, (q1, k2, v2, q2, k1, v1, bias1, bias2)


def _bi_eval_bwd(res, g):
    q1, k2, v2, q2, k1, v1, bias1, bias2 = res
    g1, g2 = g
    grads = _run_backward(q1, k2, v2, q2, k1, v1, bias1, bias2, None, 0.0, g1, g2)
    return (*grads, None, None)


_bi_eval.defvjp(_bi_eval_fwd, _bi_eval_bwd)


def fused_bi_attention(q1, k2, v2, q2, k1, v1, bias1, bias2,
                       dropout_rate: float = 0.0, dropout_rngs=None):
    """(ctx1 [B,H,S1,D], ctx2 [B,H,S2,D]): direction-1 = q1 over (k2, v2)
    with additive ``bias1`` [B,1,1,S2]-broadcastable; direction-2 = q2 over
    (k1, v1) with ``bias2`` over S1. Dropout (per direction, independent
    masks) applied in-kernel when ``dropout_rate > 0``."""
    if dropout_rate > 0.0:
        if dropout_rngs is None:
            raise ValueError("dropout_rate > 0 requires dropout_rngs")
        key1, key2 = dropout_rngs
        return _bi_train(q1, k2, v2, q2, k1, v1, bias1, bias2, key1, key2,
                         float(dropout_rate))
    return _bi_eval(q1, k2, v2, q2, k1, v1, bias1, bias2)
