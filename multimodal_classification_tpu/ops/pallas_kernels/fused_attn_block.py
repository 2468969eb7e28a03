"""Fused self-attention BLOCK Pallas TPU kernel (eval path).

One kernel computes the whole post-LN BERT attention sub-block —

    q/k/v projections → scaled-dot-product attention (masked, softmax)
    → output projection → LayerNorm(x + out)

— with all four weight matrices VMEM-resident across the row sweep
(reference chain: BertSelfAttention → BertSelfOutput,
vilbert_core.py:41-166 / vilbert_facebook_arch.py:110-221).

Why: at the serving shapes (batch 64, seq-32 bucket) each dense op is only
~10-60 µs of ideal MXU time, so the eval step's wall time is dominated by
per-fusion dispatch/scheduling gaps rather than FLOPs (the batch-64 profile:
~212 fusions, ~55% of the dot roofline). Together with the fused FFN kernel
(fused_ffn.py) this reduces a transformer layer from ~10 XLA fusions to two
Pallas calls; activations between the five fused matmuls never round-trip
HBM.

Grid: one program per block of ``bb`` whole batch items (``R = bb*S`` rows).
Attention stays inside the block: per head, scores are computed as one
``[R, R]`` MXU dot and masked block-diagonally (items never attend across
each other), which wastes ``(bb-1)/bb`` of the score FLOPs but keeps the MXU
on large tiles — at S=32 the score matmuls are ~7% of the block's FLOPs, so
an 8× waste there costs far less than per-head-dot launch overhead would.

Numerics mirror the unfused model path op-for-op (same dtype discipline:
bf16 dots with f32 MXU accumulation rounded at each dense output, f32
softmax, f32 LayerNorm over f32 residual sum — see ``_block_reference``, the
XLA twin used by the parity tests and as the off-TPU/backward path).

Int8 variant: the serving int8 path's per-output-channel weight quantization
(ops/quant.py) with dynamic per-row activation scales; the input block is
quantized ONCE and shared by the q/k/v dots (the unfused path quantizes the
same tensor three times — bit-identical scales, one-third the quant work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANE = 8
_LANE = 128
_VMEM_BUDGET = 13 * 2 ** 20
NEG_INF = -1e9  # matches ops.attention.NEG_INF


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_layout(seq: int, hidden: int, itemsize: int, int8: bool):
    """Choose (padded per-item rows s_p, items per program bb) such that the
    program's row count R = bb*s_p is lane-aligned (%128 — the key-bias
    block rides with R on the LANE axis, and Mosaic requires lane blocks be
    128-divisible) and the working set — weights + activations + one [R, R]
    score matrix — fits VMEM. Prefers the smallest padding, then the
    largest block. Returns (0, 0) when nothing fits."""
    weights = 4 * hidden * hidden * (1 if int8 else itemsize)
    for mult in (16, 32, 64, 128):
        s_p = _round_up(seq, mult)
        for bb in (16, 8, 4, 2, 1):
            r = bb * s_p
            if r % 128 or r > 1024:
                continue
            working = (
                weights
                + 4 * r * hidden * itemsize    # x in/out, double-buffered
                + 4 * r * hidden * itemsize    # q/k/v/ctx (compute dtype)
                + 2 * r * r * 4                # scores + probs (f32)
                + r * hidden * 4               # f32 residual/LN temp
                + (r * hidden if int8 else 0)  # quantized input block
            )
            if working <= _VMEM_BUDGET:
                return s_p, bb
    return 0, 0


def supported(batch: int, seq: int, hidden: int, num_heads: int, dtype,
              int8: bool = False) -> bool:
    if hidden % _LANE or hidden % num_heads:
        return False
    if (hidden // num_heads) % 64:
        return False
    return _pick_layout(seq, hidden, jnp.dtype(dtype).itemsize, int8)[1] > 0


# ---------------------------------------------------------------------------
# shared math
# ---------------------------------------------------------------------------


def _masked_cross_attention(q, k, v, key_bias_row, sq: int, sk: int,
                            num_heads: int, cdt):
    """Attention of a [Rq, H] query block over a [Rk, H] key/value block,
    both holding the same whole items (Rq//sq == Rk//sk), computed per head
    as one [Rq, Rk] dot masked block-diagonally (queries only see their own
    item's keys). ``key_bias_row``: [1, Rk] f32 additive key bias
    (0 / NEG_INF). Returns [Rq, H] in ``cdt``."""
    rq, rk = q.shape[0], k.shape[0]
    d = q.shape[1] // num_heads
    scale = 1.0 / (d ** 0.5)
    item_row = jax.lax.broadcasted_iota(jnp.int32, (rq, rk), 0) // sq
    item_col = jax.lax.broadcasted_iota(jnp.int32, (rq, rk), 1) // sk
    cross = jnp.where(item_row == item_col, 0.0, NEG_INF).astype(jnp.float32)
    add = cross + key_bias_row.astype(jnp.float32)

    ctx = []
    for h in range(num_heads):
        qh = q[:, h * d:(h + 1) * d]
        kh = k[:, h * d:(h + 1) * d]
        vh = v[:, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + add
        p = jax.nn.softmax(s, axis=-1).astype(cdt)
        # Mosaic requires a 32-bit matmul accumulator: accumulate f32 and
        # round — identical numerics to the bf16-out dot the XLA twin takes
        # (the MXU accumulates f32 internally either way)
        ctx.append(
            jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cdt)
        )
    return jnp.concatenate(ctx, axis=1)


def _masked_block_attention(q, k, v, key_bias_row, seq: int, num_heads: int,
                            cdt):
    return _masked_cross_attention(q, k, v, key_bias_row, seq, seq,
                                   num_heads, cdt)


def _layernorm_f32(x, gamma_row, beta_row):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-12)
    return (x - mu) * inv * gamma_row + beta_row


def _rowquant(xf):
    """Dynamic symmetric per-row int8 quantization — matches
    ops/quant.py::int8_dot's dynamic path (and fused_ffn._rowquant)."""
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    ascale = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    q = jnp.clip(jnp.rint(xf / ascale), -127, 127).astype(jnp.int8)
    return q, ascale


# ---------------------------------------------------------------------------
# float kernel
# ---------------------------------------------------------------------------


def _kernel(x_ref, bias_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wo_ref, bo_ref, g_ref, b_ref, o_ref, *, seq, num_heads):
    cdt = x_ref.dtype

    def dense(x, w_ref, b_ref_):
        # f32 MXU accumulation rounded to the compute dtype — exactly what
        # QuantizableDense's bf16-out dot does (Mosaic additionally requires
        # the accumulator be 32-bit, hence the explicit preferred type)
        y = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
        return y.astype(cdt) + b_ref_[0:1, :].astype(cdt)

    x = x_ref[:]
    q = dense(x, wq_ref, bq_ref)
    k = dense(x, wk_ref, bk_ref)
    v = dense(x, wv_ref, bv_ref)
    ctx = _masked_block_attention(q, k, v, bias_ref[0:1, :], seq, num_heads, cdt)
    a = dense(ctx, wo_ref, bo_ref)
    h = _layernorm_f32(
        a.astype(jnp.float32) + x.astype(jnp.float32),
        g_ref[0:1, :], b_ref[0:1, :],
    )
    o_ref[:] = h.astype(cdt)


def _block_reference(x3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta,
                     num_heads: int):
    """XLA twin with the kernel's exact op/dtype sequence (which is itself the
    unfused model path's): bf16 dense outputs, f32 scores/softmax, bf16
    probs·V, f32 LayerNorm. [B, S, H] in, [B, S, H] out."""
    b, s, hd = x3.shape
    cdt = x3.dtype
    d = hd // num_heads

    def dense(x, w, bias):
        y = jax.lax.dot_general(
            x, w.astype(cdt), (((x.ndim - 1,), (0,)), ((), ()))
        )
        return y + bias.astype(cdt)

    q = dense(x3, wq, bq).reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    k = dense(x3, wk, bk).reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    v = dense(x3, wv, bv).reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / (d ** 0.5)) + key_bias[:, None, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(cdt)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, s, hd)
    a = dense(ctx, wo, bo)
    h = _layernorm_f32(
        a.astype(jnp.float32) + x3.astype(jnp.float32),
        gamma.astype(jnp.float32)[None, None, :],
        beta.astype(jnp.float32)[None, None, :],
    )
    return h.astype(cdt)


def _replicate(vec):
    return jnp.broadcast_to(
        vec.astype(jnp.float32)[None, :], (_SUBLANE, vec.shape[0])
    )


def _pad_items(x3, key_bias, bb: int, s_p: int):
    """Pad the batch to a block multiple and each item's rows to the tiled
    per-item count; padded rows get NEG_INF key bias so no real row attends
    to them (their own outputs are garbage, sliced off by the caller)."""
    b, s, hd = x3.shape
    b_p = _round_up(b, bb)
    if b_p != b or s_p != s:
        x3 = jnp.pad(x3, ((0, b_p - b), (0, s_p - s), (0, 0)))
        key_bias = jnp.pad(key_bias, ((0, b_p - b), (0, s_p - s)),
                           constant_values=NEG_INF)
    return x3, key_bias, b_p


def _run(num_heads, x3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta):
    b, s, hd = x3.shape
    cdt = x3.dtype
    s_p, bb = _pick_layout(s, hd, jnp.dtype(cdt).itemsize, int8=False)
    x3, key_bias, b_p = _pad_items(x3, key_bias, bb, s_p)
    r = bb * s_p
    x2 = x3.reshape(b_p * s_p, hd)
    # key bias rides sublane-replicated [8, rows] (flat rows fall foul of the
    # Mosaic (8,128) tiling rule, like the flash kernel's row stats)
    bias_rep = jnp.broadcast_to(
        key_bias.reshape(1, b_p * s_p).astype(jnp.float32), (_SUBLANE, b_p * s_p)
    )
    operands = [
        x2, bias_rep,
        wq.astype(cdt), _replicate(bq),
        wk.astype(cdt), _replicate(bk),
        wv.astype(cdt), _replicate(bv),
        wo.astype(cdt), _replicate(bo),
        _replicate(gamma), _replicate(beta),
    ]
    const = lambda a: pl.BlockSpec(  # noqa: E731 — whole array, fetched once
        a.shape, lambda n: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, seq=s_p, num_heads=num_heads),
        grid=(b_p * s_p // r,),
        in_specs=[
            pl.BlockSpec((r, hd), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, r), lambda n: (0, n), memory_space=pltpu.VMEM),
        ] + [const(a) for a in operands[2:]],
        out_specs=pl.BlockSpec((r, hd), lambda n: (n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_p * s_p, hd), cdt),
        cost_estimate=pl.CostEstimate(
            flops=8 * b_p * s_p * hd * hd + 4 * (b_p * s_p) * r * hd,
            bytes_accessed=(2 * b_p * s_p * hd + 4 * hd * hd)
            * jnp.dtype(cdt).itemsize,
            transcendentals=b_p * s_p * r,
        ),
    )(*operands)
    out = out.reshape(b_p, s_p, hd)
    return out[:b, :s]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _block(num_heads, x3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo, gamma,
           beta):
    return _run(num_heads, x3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                gamma, beta)


def _block_fwd(num_heads, *args):
    return _block(num_heads, *args), args


def _block_bwd(num_heads, res, g):
    # recompute through the XLA twin (the fused block only serves eval; this
    # keeps it differentiable wherever it is enabled)
    _, vjp = jax.vjp(lambda *t: _block_reference(*t, num_heads=num_heads),
                     *res)
    return vjp(g)


_block.defvjp(_block_fwd, _block_bwd)


def fused_attn_block(x3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo, gamma,
                     beta, num_heads: int):
    """Post-LN self-attention block over ``x3 [B, S, H]``.

    ``key_bias [B, S]`` additive f32 (0 for real tokens, −1e9 masked);
    weights ``[H, H]`` f32 (cast to the compute dtype), LayerNorm
    ``gamma/beta [H]`` f32. Returns ``LN(x + SelfAttnOut(x)) [B, S, H]``.
    """
    return _block(num_heads, x3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                  gamma, beta)


block_reference = _block_reference


# ---------------------------------------------------------------------------
# int8 variant (serving path): per-output-channel int8 weights, dynamic
# per-row activation scales; the input block is quantized once for q/k/v
# ---------------------------------------------------------------------------


def _kernel_int8(x_ref, bias_ref, qq_ref, sq_ref, bq_ref, qk_ref, sk_ref,
                 bk_ref, qv_ref, sv_ref, bv_ref, qo_ref, so_ref, bo_ref,
                 g_ref, b_ref, o_ref, *, seq, num_heads):
    cdt = x_ref.dtype
    x = x_ref[:]
    qx, ax = _rowquant(x.astype(jnp.float32))

    def int8_dense(qw_ref, s_ref, b_ref_, qin, ain):
        acc = jax.lax.dot_general(
            qin, qw_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * ain * s_ref[0:1, :]).astype(cdt)
        return y + b_ref_[0:1, :].astype(cdt)

    q = int8_dense(qq_ref, sq_ref, bq_ref, qx, ax)
    k = int8_dense(qk_ref, sk_ref, bk_ref, qx, ax)
    v = int8_dense(qv_ref, sv_ref, bv_ref, qx, ax)
    ctx = _masked_block_attention(q, k, v, bias_ref[0:1, :], seq, num_heads, cdt)
    qc, ac = _rowquant(ctx.astype(jnp.float32))
    a = int8_dense(qo_ref, so_ref, bo_ref, qc, ac)
    h = _layernorm_f32(
        a.astype(jnp.float32) + x.astype(jnp.float32),
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


def block_int8_reference(x3, key_bias, qq, sq, bq, qk, sk, bk, qv, sv, bv,
                         qo, so, bo, gamma, beta, num_heads: int):
    """XLA twin of the int8 kernel (same quantize→dot→dequant chain)."""
    b, s, hd = x3.shape
    cdt = x3.dtype
    d = hd // num_heads
    q = _int8_dense_ref(x3, qq, sq, bq, cdt).reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    k = _int8_dense_ref(x3, qk, sk, bk, cdt).reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    v = _int8_dense_ref(x3, qv, sv, bv, cdt).reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / (d ** 0.5)) + key_bias[:, None, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(cdt)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, s, hd)
    a = _int8_dense_ref(ctx, qo, so, bo, cdt)
    h = _layernorm_f32(
        a.astype(jnp.float32) + x3.astype(jnp.float32),
        gamma.astype(jnp.float32)[None, None, :],
        beta.astype(jnp.float32)[None, None, :],
    )
    return h.astype(cdt)


def fused_attn_block_int8(x3, key_bias, qq, sq, bq, qk, sk, bk, qv, sv, bv,
                          qo, so, bo, gamma, beta, num_heads: int):
    """Int8 post-LN self-attention block (inference-only — the serving int8
    path is never differentiated). ``q*: [H, H] int8``, ``s*: [H] f32``
    per-output-channel weight scales, biases/LN f32."""
    b, s, hd = x3.shape
    cdt = x3.dtype
    s_p, bb = _pick_layout(s, hd, jnp.dtype(cdt).itemsize, int8=True)
    x3, key_bias, b_p = _pad_items(x3, key_bias, bb, s_p)
    r = bb * s_p
    x2 = x3.reshape(b_p * s_p, hd)
    bias_rep = jnp.broadcast_to(
        key_bias.reshape(1, b_p * s_p).astype(jnp.float32), (_SUBLANE, b_p * s_p)
    )
    operands = [
        x2, bias_rep,
        qq, _replicate(sq), _replicate(bq),
        qk, _replicate(sk), _replicate(bk),
        qv, _replicate(sv), _replicate(bv),
        qo, _replicate(so), _replicate(bo),
        _replicate(gamma), _replicate(beta),
    ]
    const = lambda a: pl.BlockSpec(  # noqa: E731 — whole array, fetched once
        a.shape, lambda n: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel_int8, seq=s_p, num_heads=num_heads),
        grid=(b_p * s_p // r,),
        in_specs=[
            pl.BlockSpec((r, hd), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, r), lambda n: (0, n), memory_space=pltpu.VMEM),
        ] + [const(a) for a in operands[2:]],
        out_specs=pl.BlockSpec((r, hd), lambda n: (n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_p * s_p, hd), cdt),
        cost_estimate=pl.CostEstimate(
            flops=8 * b_p * s_p * hd * hd + 4 * (b_p * s_p) * r * hd,
            bytes_accessed=2 * b_p * s_p * hd * jnp.dtype(cdt).itemsize
            + 4 * hd * hd,
            transcendentals=b_p * s_p * r,
        ),
    )(*operands)
    out = out.reshape(b_p, s_p, hd)
    return out[:b, :s]
