"""Fused attention Pallas TPU kernel.

ViLBERT's sequences are short (≤128 text tokens, ≤100 regions — SURVEY.md §5
"a fused Pallas attention kernel over ≤(128+100) tokens is the right scope"),
so unlike a flash-attention tiling over long sequences, the right TPU shape
is: one grid program per (batch, head) that keeps Q, K, V and the full
[Sq, Skv] score matrix resident in VMEM — scores never touch HBM, softmax
accumulates in fp32, both matmuls hit the MXU.

Gradients: the kernel defines a custom VJP whose backward recomputes through
the jnp reference implementation (ops.attention._attention_xla) — forward
inference gets the fused kernel, training gets XLA-fused gradients. (A fused
backward kernel is a later optimisation.)

Replaces the reference's unfused torch matmul-softmax chains
(vilbert_facebook_arch.py:253-294, vilbert_core.py:61-145).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_SEQ = 2048  # VMEM comfort bound for the full-scores design
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supports(q, k, v, bias) -> bool:
    if q.ndim != 4 or k.ndim != 4 or v.ndim != 4:
        return False
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if sq > MAX_SEQ or skv > MAX_SEQ or d > 256:
        return False
    if k.shape != (b, h, skv, d) or v.shape != (b, h, skv, d):
        return False
    if bias is not None:
        if bias.ndim != 4:
            return False
        bb, bh, bq, bk = bias.shape
        if bk != skv or bb not in (1, b) or bh not in (1, h) or bq not in (1, sq):
            return False
    return True


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float, has_bias: bool):
    q = q_ref[0, 0].astype(jnp.float32)  # [Sq, D]
    k = k_ref[0, 0].astype(jnp.float32)  # [Skv, D]
    v = v_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Sq, Skv]
    if has_bias:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_attention(q, k, v, bias=None):
    return _forward(q, k, v, bias)


def _forward(q, k, v, bias):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = 1.0 / (d ** 0.5)

    sq_p = _round_up(sq, _SUBLANE)
    skv_p = _round_up(skv, _SUBLANE)
    needs_kv_pad = skv_p != skv
    if needs_kv_pad and bias is None:
        bias = jnp.zeros((1, 1, 1, skv), q.dtype)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if needs_kv_pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    has_bias = bias is not None
    if has_bias:
        # broadcast to full [B, H, Sq, Skv], then pad (padded keys get -1e9)
        bias = jnp.broadcast_to(bias.astype(jnp.float32), (b, h, sq, skv))
        # padded rows/cols get -1e9; an all-(-1e9) row still softmaxes to a
        # finite uniform distribution (max-subtraction), and padded query rows
        # are sliced away below
        bias = jnp.pad(
            bias,
            ((0, 0), (0, 0), (0, sq_p - sq), (0, skv_p - skv)),
            constant_values=-1e9,
        )

    grid = (b, h)
    in_specs = [
        pl.BlockSpec((1, 1, sq_p, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, skv_p, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, skv_p, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, 1, sq_p, skv_p), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(bias)
        kernel = functools.partial(_kernel, scale=scale, has_bias=True)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, orf, **kw: _kernel(qr, kr, vr, None, orf, **kw),
            scale=scale, has_bias=False,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, sq_p, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (sq_p * skv_p * d * 2),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * sq_p * skv_p,
        ),
    )(*args)
    if sq_p != sq:
        out = out[:, :, :sq, :]
    return out


def _ref_attention(q, k, v, bias):
    from multimodal_classification_tpu.ops.attention import _attention_xla

    return _attention_xla(q, k, v, bias, 0.0, None)


def _fwd(q, k, v, bias):
    return _forward(q, k, v, bias), (q, k, v, bias)


def _bwd(residuals, g):
    q, k, v, bias = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: _ref_attention(q_, k_, v_, bias), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


fused_attention.defvjp(_fwd, _bwd)
