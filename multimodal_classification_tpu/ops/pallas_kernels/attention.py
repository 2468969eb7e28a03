"""Fused attention Pallas TPU kernel — forward AND backward, with dropout.

ViLBERT's sequences are short (≤128 text tokens, ≤100 regions — SURVEY.md §5
"a fused Pallas attention kernel over ≤(128+100) tokens is the right scope"),
so unlike a flash-attention tiling over long sequences, the right TPU shape
is: one grid program per (batch, head) that keeps Q, K, V and the full
[Sq, Skv] score matrix resident in VMEM — scores never touch HBM, softmax
accumulates in fp32, all matmuls hit the MXU.

Training path:
- Attention-prob dropout is applied *inside* the kernel. The random bits are
  drawn once per call from the step's PRNG key with ``jax.random.bits`` (one
  hardware-RNG HLO — cheaper than per-program seeding, and exactly
  reproducible on any backend, which keeps CPU parity tests honest), then
  consumed in VMEM; the [Sq, Skv] probability/mask tensors never hit HBM.
- The backward is a second fused kernel that recomputes scores/probs (cheap
  at these sizes — recompute beats storing [B, H, Sq, Skv] residuals) and
  emits dq, dk, dv in one pass. Only (q, k, v, bias, key) are saved; the
  dropout mask is regenerated bit-exactly from the key.

Replaces the reference's unfused torch matmul-softmax chains
(vilbert_facebook_arch.py:253-294, vilbert_core.py:61-145).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_SEQ = 512  # VMEM comfort bound for the full-scores fwd+bwd design
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def keep_threshold(rate: float) -> int:
    """uint32 threshold: drop where bits < threshold ⇒ P(drop) = rate."""
    return min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1)


def dropout_bits(key: jax.Array, shape) -> jnp.ndarray:
    """The canonical bit stream for attention-prob dropout (also used by the
    XLA twin in parity tests)."""
    return jax.random.bits(key, shape, jnp.uint32)


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


def _softmax_fp32(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _fwd_kernel(refs, o_ref, *, scale, has_bias, thresh, inv_keep):
    it = iter(refs)
    q = next(it)[0, 0].astype(jnp.float32)  # [Sq, D]
    k = next(it)[0, 0].astype(jnp.float32)  # [Skv, D]
    v = next(it)[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Sq, Skv]
    if has_bias:
        s = s + next(it)[0, 0].astype(jnp.float32)
    p = _softmax_fp32(s)
    if thresh is not None:
        keep = next(it)[0, 0] >= jnp.uint32(thresh)
        p = jnp.where(keep, p * inv_keep, 0.0)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(refs, dq_ref, dk_ref, dv_ref, *, scale, has_bias, thresh, inv_keep):
    it = iter(refs)
    q = next(it)[0, 0].astype(jnp.float32)
    k = next(it)[0, 0].astype(jnp.float32)
    v = next(it)[0, 0].astype(jnp.float32)
    bias = next(it)[0, 0].astype(jnp.float32) if has_bias else None
    bits = next(it)[0, 0] if thresh is not None else None
    g = next(it)[0, 0].astype(jnp.float32)  # [Sq, D]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        s = s + bias
    p = _softmax_fp32(s)  # [Sq, Skv]
    if bits is not None:
        keep = bits >= jnp.uint32(thresh)
        pd = jnp.where(keep, p * inv_keep, 0.0)
    else:
        pd = p

    # o = pd @ v  ⇒  dv = pdᵀ @ g ; dpd = g @ vᵀ
    dv = jax.lax.dot_general(
        pd, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Skv, D]
    dpd = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Sq, Skv]
    dp = jnp.where(keep, dpd * inv_keep, 0.0) if bits is not None else dpd
    # softmax VJP: ds = p ⊙ (dp − Σₖ dpₖ pₖ)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale  # [Sq, D]
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Skv, D]
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _pad_inputs(q, k, v, bias):
    """Pad seq dims to sublane multiples; returns padded tensors + dims."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    sq_p = _round_up(sq, _SUBLANE)
    skv_p = _round_up(skv, _SUBLANE)
    if bias is None and skv_p != skv:
        bias = jnp.zeros((1, 1, 1, skv), jnp.float32)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if skv_p != skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    if bias is not None:
        # padded keys get -1e9; an all-(-1e9) row still softmaxes to a finite
        # uniform distribution (max-subtraction), and padded query rows are
        # sliced away by the caller
        bias = jnp.broadcast_to(bias.astype(jnp.float32), (b, h, sq, skv))
        bias = jnp.pad(
            bias, ((0, 0), (0, 0), (0, sq_p - sq), (0, skv_p - skv)),
            constant_values=-1e9,
        )
    return q, k, v, bias, (b, h, sq, skv, sq_p, skv_p, d)


def _spec(*block):
    return pl.BlockSpec((1, 1, *block), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)


def _padded_bits(key, b, h, sq, skv, sq_p, skv_p):
    bits = dropout_bits(key, (b, h, sq, skv))
    return jnp.pad(bits, ((0, 0), (0, 0), (0, sq_p - sq), (0, skv_p - skv)))


def _run_forward(q, k, v, bias, key, rate):
    qp, kp, vp, biasp, (b, h, sq, skv, sq_p, skv_p, d) = _pad_inputs(q, k, v, bias)
    has_bias = biasp is not None
    thresh = keep_threshold(rate) if rate > 0.0 else None
    args = [qp, kp, vp]
    in_specs = [_spec(sq_p, d), _spec(skv_p, d), _spec(skv_p, d)]
    if has_bias:
        args.append(biasp)
        in_specs.append(_spec(sq_p, skv_p))
    if thresh is not None:
        args.append(_padded_bits(key, b, h, sq, skv, sq_p, skv_p))
        in_specs.append(_spec(sq_p, skv_p))

    kernel = functools.partial(
        lambda *a, **kw: _fwd_kernel(a[:-1], a[-1], **kw),
        scale=1.0 / (d ** 0.5), has_bias=has_bias, thresh=thresh,
        inv_keep=1.0 / (1.0 - rate) if rate > 0.0 else 1.0,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=in_specs,
        out_specs=_spec(sq_p, d),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (sq_p * skv_p * d * 2),
            bytes_accessed=(qp.size + kp.size + vp.size) * q.dtype.itemsize,
            transcendentals=b * h * sq_p * skv_p,
        ),
    )(*args)
    if sq_p != sq:
        out = out[:, :, :sq, :]
    return out


def _run_backward(q, k, v, bias, key, rate, g):
    qp, kp, vp, biasp, (b, h, sq, skv, sq_p, skv_p, d) = _pad_inputs(q, k, v, bias)
    has_bias = biasp is not None
    thresh = keep_threshold(rate) if rate > 0.0 else None
    if sq_p != sq:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    args = [qp, kp, vp]
    in_specs = [_spec(sq_p, d), _spec(skv_p, d), _spec(skv_p, d)]
    if has_bias:
        args.append(biasp)
        in_specs.append(_spec(sq_p, skv_p))
    if thresh is not None:
        args.append(_padded_bits(key, b, h, sq, skv, sq_p, skv_p))
        in_specs.append(_spec(sq_p, skv_p))
    args.append(g)
    in_specs.append(_spec(sq_p, d))

    kernel = functools.partial(
        lambda *a, **kw: _bwd_kernel(a[:-3], a[-3], a[-2], a[-1], **kw),
        scale=1.0 / (d ** 0.5), has_bias=has_bias, thresh=thresh,
        inv_keep=1.0 / (1.0 - rate) if rate > 0.0 else 1.0,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=in_specs,
        out_specs=(_spec(sq_p, d), _spec(skv_p, d), _spec(skv_p, d)),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, skv_p, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, skv_p, d), v.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * (sq_p * skv_p * d * 2),
            bytes_accessed=(qp.size + kp.size + vp.size + g.size) * q.dtype.itemsize,
            transcendentals=b * h * sq_p * skv_p,
        ),
    )(*args)
    if sq_p != sq:
        dq = dq[:, :, :sq, :]
    if skv_p != skv:
        dk = dk[:, :, :skv, :]
        dv = dv[:, :, :skv, :]
    return dq, dk, dv


# --- public entry points ----------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _attention_train(q, k, v, bias, key, rate):
    return _run_forward(q, k, v, bias, key, rate)


def _train_fwd(q, k, v, bias, key, rate):
    return _run_forward(q, k, v, bias, key, rate), (q, k, v, bias, key)


def _train_bwd(rate, res, g):
    q, k, v, bias, key = res
    dq, dk, dv = _run_backward(q, k, v, bias, key, rate, g)
    return dq, dk, dv, None, None


_attention_train.defvjp(_train_fwd, _train_bwd)


@jax.custom_vjp
def _attention_eval(q, k, v, bias):
    return _run_forward(q, k, v, bias, None, 0.0)


def _eval_fwd(q, k, v, bias):
    return _run_forward(q, k, v, bias, None, 0.0), (q, k, v, bias)


def _eval_bwd(res, g):
    q, k, v, bias = res
    dq, dk, dv = _run_backward(q, k, v, bias, None, 0.0, g)
    return dq, dk, dv, None


_attention_eval.defvjp(_eval_fwd, _eval_bwd)


def fused_attention(q, k, v, bias=None, dropout_rate: float = 0.0,
                    dropout_rng=None):
    """Fused scaled-dot-product attention; dropout applied in-kernel when
    ``dropout_rate > 0`` (requires ``dropout_rng``)."""
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        return _attention_train(q, k, v, bias, dropout_rng, float(dropout_rate))
    return _attention_eval(q, k, v, bias)
