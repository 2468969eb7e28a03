"""Fused cross-attention DIRECTION Pallas TPU kernel (eval path).

One kernel computes one direction of the ViLBERT co-attention block —

    q projection (query stream) + k/v projections (other stream)
    → masked cross-attention in the shared bi-space
    → output projection back to the query stream → residual LayerNorm

— with all four weight matrices VMEM-resident (reference chain:
BiAttention → BiOutput, vilbert_facebook_arch.py:222-394; the core
variant's BertCoAttention → BertSelfOutput, vilbert_core.py:91-166).

A co-attention block is two directions (t→v and v→t); fusing each as one
kernel turns the block's ~20 XLA fusions into two Pallas calls + the two
(already fused) per-stream FFNs. The two directions deliberately stay
separate kernels: each needs its own key-bias row on the LANE axis (Mosaic
requires lane blocks be 128-divisible, so both streams' row counts would
have to align simultaneously in a combined kernel) and four resident weight
matrices per direction already fill the comfortable VMEM budget.

Grid/blocks: one program per ``bb`` whole batch items — the query stream
contributes ``Rq = bb*sq_p`` rows and the key/value stream ``Rk = bb*sk_p``
rows; cross-attention is masked block-diagonally over items exactly like
fused_attn_block's self-attention. Numerics mirror the unfused model path
op-for-op (same dtype discipline); the XLA twin backs the parity tests and
the off-TPU path. Int8 variant pairs with ops/quant.py's offline weight
quantization, activations row-quantized in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_classification_tpu.ops.pallas_kernels.fused_attn_block import (  # noqa: E501
    NEG_INF,
    _layernorm_f32,
    _masked_cross_attention,
    _replicate,
    _round_up,
    _rowquant,
    _SUBLANE,
    _VMEM_BUDGET,
)

_LANE = 128


def _pick_layout(sq: int, sk: int, hq: int, hkv: int, bi: int,
                 itemsize: int, int8: bool):
    """(sq_p, sk_p, bb) such that both row counts are lane-aligned (%128 —
    each key-bias row rides on the LANE axis of its scores) and the working
    set fits VMEM. Returns (0, 0, 0) when nothing fits."""
    w_bytes = (hq * bi + 2 * hkv * bi + bi * hq) * (1 if int8 else itemsize)
    for mult in (16, 32, 64, 128):
        sq_p = _round_up(sq, mult)
        for multk in (16, 32, 64, 128):
            sk_p = _round_up(sk, multk)
            for bb in (8, 4, 2, 1):
                rq, rk = bb * sq_p, bb * sk_p
                if rq % _LANE or rk % _LANE or rq > 1024 or rk > 1024:
                    continue
                working = (
                    w_bytes
                    + 4 * rq * hq * itemsize       # xq in/out double-buffered
                    + 2 * rk * hkv * itemsize      # xkv in (double-buffered)
                    + (rq + 2 * rk + rq) * bi * itemsize  # q, k, v, ctx
                    + 2 * rq * rk * 4              # scores + probs (f32)
                    + rq * hq * 4                  # f32 residual/LN temp
                    + ((rq * hq + rk * hkv) if int8 else 0)
                )
                if working <= _VMEM_BUDGET:
                    return sq_p, sk_p, bb
    return 0, 0, 0


def supported_co(sq: int, sk: int, hq: int, hkv: int, bi: int,
                 num_heads: int, dtype, int8: bool = False) -> bool:
    if hq % _LANE or hkv % _LANE or bi % _LANE or bi % num_heads:
        return False
    if (bi // num_heads) % 64:
        return False
    return _pick_layout(sq, sk, hq, hkv, bi, jnp.dtype(dtype).itemsize,
                        int8)[2] > 0


# ---------------------------------------------------------------------------
# float kernel
# ---------------------------------------------------------------------------


def _kernel(xq_ref, xkv_ref, bias_ref, wq_ref, bq_ref, wk_ref, bk_ref,
            wv_ref, bv_ref, wo_ref, bo_ref, g_ref, b_ref, o_ref, *,
            sq, sk, num_heads):
    cdt = xq_ref.dtype

    def dense(x, w_ref, b_ref_):
        y = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
        return y.astype(cdt) + b_ref_[0:1, :].astype(cdt)

    xq = xq_ref[:]
    xkv = xkv_ref[:]
    q = dense(xq, wq_ref, bq_ref)
    k = dense(xkv, wk_ref, bk_ref)
    v = dense(xkv, wv_ref, bv_ref)
    ctx = _masked_cross_attention(q, k, v, bias_ref[0:1, :], sq, sk,
                                  num_heads, cdt)
    a = dense(ctx, wo_ref, bo_ref)
    h = _layernorm_f32(
        a.astype(jnp.float32) + xq.astype(jnp.float32),
        g_ref[0:1, :], b_ref[0:1, :],
    )
    o_ref[:] = h.astype(cdt)


def co_dir_reference(xq3, xkv3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                     gamma, beta, num_heads: int):
    """XLA twin: one cross-attention direction + residual LN over the query
    stream, with the kernel's exact op/dtype sequence. [B, Sq, Hq] out."""
    b, sq, hq = xq3.shape
    _, sk, _ = xkv3.shape
    bi = wq.shape[1]
    d = bi // num_heads
    cdt = xq3.dtype

    def dense(x, w, bias):
        y = jax.lax.dot_general(
            x, w.astype(cdt), (((x.ndim - 1,), (0,)), ((), ()))
        )
        return y + bias.astype(cdt)

    q = dense(xq3, wq, bq).reshape(b, sq, num_heads, d).transpose(0, 2, 1, 3)
    k = dense(xkv3, wk, bk).reshape(b, sk, num_heads, d).transpose(0, 2, 1, 3)
    v = dense(xkv3, wv, bv).reshape(b, sk, num_heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / (d ** 0.5)) + key_bias[:, None, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(cdt)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, sq, bi)
    a = dense(ctx, wo, bo)
    h = _layernorm_f32(
        a.astype(jnp.float32) + xq3.astype(jnp.float32),
        gamma.astype(jnp.float32)[None, None, :],
        beta.astype(jnp.float32)[None, None, :],
    )
    return h.astype(cdt)


def _pad_streams(xq3, xkv3, key_bias, bb, sq_p, sk_p):
    b = xq3.shape[0]
    b_p = _round_up(b, bb)
    if b_p != b or sq_p != xq3.shape[1]:
        xq3 = jnp.pad(xq3, ((0, b_p - b), (0, sq_p - xq3.shape[1]), (0, 0)))
    if b_p != b or sk_p != xkv3.shape[1]:
        xkv3 = jnp.pad(xkv3, ((0, b_p - b), (0, sk_p - xkv3.shape[1]), (0, 0)))
        key_bias = jnp.pad(key_bias,
                           ((0, b_p - b), (0, sk_p - key_bias.shape[1])),
                           constant_values=NEG_INF)
    return xq3, xkv3, key_bias, b_p


def _call(kernel, operands, rq, rk, hq, hkv, b_p, sq_p, sk_p, cdt, bi):
    const = lambda a: pl.BlockSpec(  # noqa: E731 — whole array, fetched once
        a.shape, lambda n: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    n_q, n_k = b_p * sq_p, b_p * sk_p
    return pl.pallas_call(
        kernel,
        grid=(n_q // rq,),
        in_specs=[
            pl.BlockSpec((rq, hq), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rk, hkv), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, rk), lambda n: (0, n), memory_space=pltpu.VMEM),
        ] + [const(a) for a in operands[3:]],
        out_specs=pl.BlockSpec((rq, hq), lambda n: (n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_q, hq), cdt),
        cost_estimate=pl.CostEstimate(
            # q + out projections over n_q rows, k + v over n_k, and the
            # block-diagonal score/context dots
            flops=4 * n_q * hq * bi + 4 * n_k * hkv * bi + 4 * n_q * rk * bi,
            bytes_accessed=(2 * n_q * hq + n_k * hkv
                            + (hq * bi + 2 * hkv * bi + bi * hq))
            * jnp.dtype(cdt).itemsize,
            transcendentals=n_q * rk,
        ),
    )(*operands)


def _run(num_heads, xq3, xkv3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo,
         gamma, beta):
    b, sq, hq = xq3.shape
    _, sk, hkv = xkv3.shape
    bi = wq.shape[1]
    cdt = xq3.dtype
    sq_p, sk_p, bb = _pick_layout(sq, sk, hq, hkv, bi,
                                  jnp.dtype(cdt).itemsize, int8=False)
    xq3, xkv3, key_bias, b_p = _pad_streams(xq3, xkv3, key_bias, bb, sq_p, sk_p)
    rq, rk = bb * sq_p, bb * sk_p
    bias_rep = jnp.broadcast_to(
        key_bias.reshape(1, b_p * sk_p).astype(jnp.float32),
        (_SUBLANE, b_p * sk_p))
    operands = [
        xq3.reshape(b_p * sq_p, hq), xkv3.reshape(b_p * sk_p, hkv), bias_rep,
        wq.astype(cdt), _replicate(bq), wk.astype(cdt), _replicate(bk),
        wv.astype(cdt), _replicate(bv), wo.astype(cdt), _replicate(bo),
        _replicate(gamma), _replicate(beta),
    ]
    out = _call(functools.partial(_kernel, sq=sq_p, sk=sk_p, num_heads=num_heads),
                operands, rq, rk, hq, hkv, b_p, sq_p, sk_p, cdt, bi)
    return out.reshape(b_p, sq_p, hq)[:b, :sq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _co_dir(num_heads, xq3, xkv3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo,
            gamma, beta):
    return _run(num_heads, xq3, xkv3, key_bias, wq, bq, wk, bk, wv, bv,
                wo, bo, gamma, beta)


def _co_dir_fwd(num_heads, *args):
    return _co_dir(num_heads, *args), args


def _co_dir_bwd(num_heads, res, g):
    _, vjp = jax.vjp(lambda *t: co_dir_reference(*t, num_heads=num_heads), *res)
    return vjp(g)


_co_dir.defvjp(_co_dir_fwd, _co_dir_bwd)


def fused_co_dir(xq3, xkv3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                 gamma, beta, num_heads: int):
    """One cross-attention direction: ``LN(xq + Wo·Attn(Wq·xq over
    Wk/Wv·xkv))``. ``key_bias [B, Sk]`` additive f32 over the key/value
    stream's positions. Differentiable via the XLA-twin recompute."""
    return _co_dir(num_heads, xq3, xkv3, key_bias, wq, bq, wk, bk, wv, bv,
                   wo, bo, gamma, beta)


# ---------------------------------------------------------------------------
# int8 variant
# ---------------------------------------------------------------------------


def _kernel_int8(xq_ref, xkv_ref, bias_ref, qq_ref, sq_ref, bq_ref,
                 qk_ref, sk_ref, bk_ref, qv_ref, sv_ref, bv_ref,
                 qo_ref, so_ref, bo_ref, g_ref, b_ref, o_ref, *,
                 sq, sk, num_heads):
    cdt = xq_ref.dtype

    def int8_dense(qin, ain, qw_ref, s_ref, b_ref_):
        acc = jax.lax.dot_general(
            qin, qw_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * ain * s_ref[0:1, :]).astype(cdt)
        return y + b_ref_[0:1, :].astype(cdt)

    xq = xq_ref[:]
    qxq, axq = _rowquant(xq.astype(jnp.float32))
    qxk, axk = _rowquant(xkv_ref[:].astype(jnp.float32))
    q = int8_dense(qxq, axq, qq_ref, sq_ref, bq_ref)
    k = int8_dense(qxk, axk, qk_ref, sk_ref, bk_ref)
    v = int8_dense(qxk, axk, qv_ref, sv_ref, bv_ref)
    ctx = _masked_cross_attention(q, k, v, bias_ref[0:1, :], sq, sk,
                                  num_heads, cdt)
    qc, ac = _rowquant(ctx.astype(jnp.float32))
    a = int8_dense(qc, ac, qo_ref, so_ref, bo_ref)
    h = _layernorm_f32(
        a.astype(jnp.float32) + xq.astype(jnp.float32),
        g_ref[0:1, :], b_ref[0:1, :],
    )
    o_ref[:] = h.astype(cdt)


def _int8_dense_ref(x, qw, ws, bias, cdt):
    qx, ax = _rowquant(x.astype(jnp.float32))
    acc = jax.lax.dot_general(
        qx, qw, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = (acc.astype(jnp.float32) * ax * ws).astype(cdt)
    return y + bias.astype(cdt)


def co_dir_int8_reference(xq3, xkv3, key_bias, qq, ssq, bq, qk, ssk, bk,
                          qv, ssv, bv, qo, sso, bo, gamma, beta,
                          num_heads: int):
    b, sq, hq = xq3.shape
    _, sk, _ = xkv3.shape
    bi = qq.shape[1]
    d = bi // num_heads
    cdt = xq3.dtype
    q = _int8_dense_ref(xq3, qq, ssq, bq, cdt).reshape(b, sq, num_heads, d).transpose(0, 2, 1, 3)
    k = _int8_dense_ref(xkv3, qk, ssk, bk, cdt).reshape(b, sk, num_heads, d).transpose(0, 2, 1, 3)
    v = _int8_dense_ref(xkv3, qv, ssv, bv, cdt).reshape(b, sk, num_heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / (d ** 0.5)) + key_bias[:, None, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(cdt)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, sq, bi)
    a = _int8_dense_ref(ctx, qo, sso, bo, cdt)
    h = _layernorm_f32(
        a.astype(jnp.float32) + xq3.astype(jnp.float32),
        gamma.astype(jnp.float32)[None, None, :],
        beta.astype(jnp.float32)[None, None, :],
    )
    return h.astype(cdt)


def fused_co_dir_int8(xq3, xkv3, key_bias, qq, ssq, bq, qk, ssk, bk,
                      qv, ssv, bv, qo, sso, bo, gamma, beta, num_heads: int):
    """Int8 cross-attention direction (inference-only). Weight quantization
    as ops/quant.py (per-output-channel); both streams' input blocks are
    row-quantized once in-kernel (shared between this direction's k and v
    dots)."""
    b, sq, hq = xq3.shape
    _, sk, hkv = xkv3.shape
    bi = qq.shape[1]
    cdt = xq3.dtype
    sq_p, sk_p, bb = _pick_layout(sq, sk, hq, hkv, bi,
                                  jnp.dtype(cdt).itemsize, int8=True)
    xq3, xkv3, key_bias, b_p = _pad_streams(xq3, xkv3, key_bias, bb, sq_p, sk_p)
    rq, rk = bb * sq_p, bb * sk_p
    bias_rep = jnp.broadcast_to(
        key_bias.reshape(1, b_p * sk_p).astype(jnp.float32),
        (_SUBLANE, b_p * sk_p))
    operands = [
        xq3.reshape(b_p * sq_p, hq), xkv3.reshape(b_p * sk_p, hkv), bias_rep,
        qq, _replicate(ssq), _replicate(bq),
        qk, _replicate(ssk), _replicate(bk),
        qv, _replicate(ssv), _replicate(bv),
        qo, _replicate(sso), _replicate(bo),
        _replicate(gamma), _replicate(beta),
    ]
    out = _call(functools.partial(_kernel_int8, sq=sq_p, sk=sk_p,
                                  num_heads=num_heads),
                operands, rq, rk, hq, hkv, b_p, sq_p, sk_p, cdt, bi)
    return out.reshape(b_p, sq_p, hq)[:b, :sq]
