"""Fused FFN Pallas TPU kernel: ``gelu(x @ W1 + b1) @ W2 + b2`` in one pass.

Why: the HLO roofline attribution of the serving eval step
(scripts/analyze_eval_hlo.py) showed the per-layer FFN matmuls running at
~55% of MXU peak — their arithmetic intensity sits right at the bf16
roofline ridge because XLA materialises the ``[rows, intermediate]``
activation in HBM between the two matmuls (write + read = the single
largest avoidable traffic term in the forward). This kernel keeps both
weight matrices VMEM-resident across the whole row sweep and streams row
blocks through ``dot → +b1 → erf-GELU → dot → +b2`` so the intermediate
never leaves VMEM: FFN HBM traffic drops from
``x + W1 + inter·2 + W2 + y`` to ``x + W1 + W2 + y``.

Replaces the reference's unfused torch Linear→GELU→Linear chain
(vilbert_core.py:167-201 BertIntermediate/BertOutput,
vilbert_facebook_arch.py intermediate/output blocks).

Numerics: both dots accumulate in fp32 on the MXU; bias adds and the exact
(erf) GELU run in fp32 (erf itself via the A&S 7.1.26 polynomial — Mosaic
lowers neither erf nor erfc — max abs error 1.5e-7, far below the bf16
intermediate rounding); the intermediate is rounded to the compute dtype
(bf16) before the second dot — otherwise exactly the ``_ffn_reference`` twin below,
which also serves as the off-TPU path and the backward (via ``jax.vjp``
recompute; training defaults to the unfused XLA path anyway, this keeps the
op differentiable wherever it is enabled).

VMEM budget (~16 MB/core): W1 + W2 stay resident (text stream
768×3072 bf16 ×2 ≈ 9.4 MB), so the row block shrinks as the intermediate
grows — see ``_block_rows``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANE = 8
_LANE = 128
# weights + double-buffered row blocks + f32 intermediate must fit VMEM
_VMEM_BUDGET = 13 * 2 ** 20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _block_rows(h: int, i: int, itemsize: int) -> int:
    """Largest row block whose working set fits the VMEM budget."""
    weights = 2 * h * i * itemsize
    for br in (512, 256, 128, 64):
        # in/out blocks are double-buffered by the pipeline; the f32
        # intermediate (+ a GELU temp) lives once per program
        working = weights + br * (4 * h * itemsize + 2 * i * 4)
        if working <= _VMEM_BUDGET:
            return br
    return 0


def supported(h: int, i: int, dtype) -> bool:
    """Static applicability check (shapes are known at trace time)."""
    if h % _LANE or i % _LANE:
        return False
    return _block_rows(h, i, jnp.dtype(dtype).itemsize) > 0


def _ffn_reference(x2d, w1, b1, w2, b2):
    """XLA twin with the kernel's exact dtype discipline (fp32 accumulate,
    fp32 bias + erf-GELU, compute-dtype intermediate)."""
    cdt = x2d.dtype
    u = jax.lax.dot_general(
        x2d, w1.astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1.astype(jnp.float32)
    a = jax.nn.gelu(u, approximate=False).astype(cdt)
    y = jax.lax.dot_general(
        a, w2.astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2.astype(jnp.float32)
    return y.astype(cdt)


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7): Mosaic has
    no erf/erfc lowering, so the exact-GELU CDF is evaluated in-kernel with
    exp only. The error is invisible after the bf16 intermediate rounding
    (eps 7.8e-3) and sits ~10× under the f32 parity tolerances."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    u = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    u = u + b1_ref[0:1, :].astype(jnp.float32)
    a = (0.5 * u * (1.0 + _erf(u * 0.7071067811865476))).astype(x_ref.dtype)
    y = jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (y + b2_ref[0:1, :].astype(jnp.float32)).astype(o_ref.dtype)


def _replicate_bias(b):
    # biases ride as [8, N] (sublane-replicated): flat [N] / [1, N] blocks
    # fall foul of the Mosaic (8, 128) tiling rule, same as the flash
    # kernel's row stats
    return jnp.broadcast_to(b.astype(jnp.float32)[None, :], (_SUBLANE, b.shape[0]))


def _run(x2d, w1, b1, w2, b2):
    rows, h = x2d.shape
    i = w1.shape[1]
    cdt = x2d.dtype
    br = _block_rows(h, i, jnp.dtype(cdt).itemsize)
    rows_p = _round_up(rows, br)
    if rows_p != rows:
        x2d = jnp.pad(x2d, ((0, rows_p - rows), (0, 0)))
    w1c, w2c = w1.astype(cdt), w2.astype(cdt)

    b1r, b2r = _replicate_bias(b1), _replicate_bias(b2)

    const = lambda r: pl.BlockSpec(  # noqa: E731 - whole-array, fetched once
        r.shape, lambda n: (0,) * r.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel,
        grid=(rows_p // br,),
        in_specs=[
            pl.BlockSpec((br, h), lambda n: (n, 0), memory_space=pltpu.VMEM),
            const(w1c),
            const(b1r),
            const(w2c),
            const(b2r),
        ],
        out_specs=pl.BlockSpec((br, h), lambda n: (n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, h), cdt),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows_p * h * i,
            bytes_accessed=(2 * rows_p * h + 2 * h * i) * jnp.dtype(cdt).itemsize,
            transcendentals=rows_p * i,
        ),
    )(x2d, w1c, b1r, w2c, b2r)
    return out[:rows] if rows_p != rows else out


@jax.custom_vjp
def _ffn(x2d, w1, b1, w2, b2):
    return _run(x2d, w1, b1, w2, b2)


def _ffn_fwd(x2d, w1, b1, w2, b2):
    return _run(x2d, w1, b1, w2, b2), (x2d, w1, b1, w2, b2)


def _ffn_bwd(res, g):
    # recompute-based backward through the XLA twin: training defaults to
    # the unfused path, so this only needs to be correct, not optimal
    _, vjp = jax.vjp(_ffn_reference, *res)
    return vjp(g)


_ffn.defvjp(_ffn_fwd, _ffn_bwd)


def fused_ffn(x, w1, b1, w2, b2):
    """``gelu(x @ W1 + b1) @ W2 + b2`` over the last axis of ``x``.

    ``w1: [H, I]``, ``b1: [I]``, ``w2: [I, H]``, ``b2: [H]`` (float32 params;
    cast to ``x.dtype`` for the MXU). Differentiable in all five operands.
    """
    h = x.shape[-1]
    assert w1.shape[0] == h and w2.shape == (w1.shape[1], h)
    y = _ffn(x.reshape(-1, h), w1, b1, w2, b2)
    return y.reshape(*x.shape[:-1], h)


ffn_reference = _ffn_reference


# ---------------------------------------------------------------------------
# int8 variant: both matmuls on the int8 MXU path (2× the bf16 rate on v5e),
# weights VMEM-resident at HALF the bf16 bytes, dynamic per-row activation
# scales computed in-kernel for both dots. Pairs with the offline
# per-output-channel kernel quantization of ops/quant.py (the serving int8
# path); mirrors its numerics except that scaling/bias/GELU stay in f32
# instead of rounding to bf16 between the dots (a strictly tighter chain —
# the model-level test gates prediction agreement with the unfused path).
# Static (calibrated) activation scales are NOT fused — that path refuses
# at dispatch and keeps the unfused XLA body, which calibration already
# fuses well (measured throughput-neutral, docs/PERFORMANCE.md).
# ---------------------------------------------------------------------------


def _block_rows_int8(h: int, i: int, itemsize: int) -> int:
    """Row block for the int8 kernel: int8 weights + f32 intermediate +
    int8 requantized intermediate + in/out blocks under the VMEM budget."""
    weights = 2 * h * i  # two int8 matrices
    for br in (512, 256, 128, 64):
        working = weights + br * (4 * h * itemsize + 3 * i * 4 + i + h)
        if working <= _VMEM_BUDGET:
            return br
    return 0


def supported_int8(h: int, i: int, dtype) -> bool:
    if h % _LANE or i % _LANE:
        return False
    return _block_rows_int8(h, i, jnp.dtype(dtype).itemsize) > 0


def _rowquant(xf):
    """Dynamic symmetric per-row int8 quantization (f32 in), matching
    ops/quant.py::int8_dot's dynamic path."""
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    ascale = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    q = jnp.clip(jnp.rint(xf / ascale), -127, 127).astype(jnp.int8)
    return q, ascale


def _ffn_int8_reference(x2d, q1, s1, b1, q2, s2, b2):
    """XLA twin of the int8 kernel (same quantize→dot→dequant chain, same
    poly-erf GELU) — bit-exact on the same backend, and the off-TPU path."""
    qx, a1 = _rowquant(x2d.astype(jnp.float32))
    acc1 = jax.lax.dot_general(
        qx, q1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    u = acc1.astype(jnp.float32) * a1 * s1[None, :] + b1[None, :]
    g = 0.5 * u * (1.0 + _erf(u * 0.7071067811865476))
    qg, a2 = _rowquant(g)
    acc2 = jax.lax.dot_general(
        qg, q2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc2.astype(jnp.float32) * a2 * s2[None, :] + b2[None, :]
    return y.astype(x2d.dtype)


def _kernel_int8(x_ref, q1_ref, s1_ref, b1_ref, q2_ref, s2_ref, b2_ref, o_ref):
    qx, a1 = _rowquant(x_ref[:].astype(jnp.float32))
    acc1 = jax.lax.dot_general(
        qx, q1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    u = acc1.astype(jnp.float32) * a1 * s1_ref[0:1, :] + b1_ref[0:1, :]
    g = 0.5 * u * (1.0 + _erf(u * 0.7071067811865476))
    qg, a2 = _rowquant(g)
    acc2 = jax.lax.dot_general(
        qg, q2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    o_ref[:] = (acc2.astype(jnp.float32) * a2 * s2_ref[0:1, :] + b2_ref[0:1, :]).astype(
        o_ref.dtype
    )


def fused_ffn_int8(x, q1, s1, b1, q2, s2, b2):
    """Int8 ``gelu(x@deq(Q1)+b1)@deq(Q2)+b2`` over the last axis of ``x``.

    ``q1: [H, I] int8``, ``s1: [I] f32`` (per-output-channel weight scales),
    ``b1: [I] f32``; ``q2: [I, H] int8``, ``s2/b2: [H] f32``. Activations are
    quantized per row in-kernel before each dot. Inference-only (no VJP —
    the serving int8 path is never differentiated).
    """
    h = x.shape[-1]
    i = q1.shape[1]
    assert q1.shape[0] == h and q2.shape == (i, h)
    x2d = x.reshape(-1, h)
    rows = x2d.shape[0]
    cdt = x2d.dtype
    br = _block_rows_int8(h, i, jnp.dtype(cdt).itemsize)
    rows_p = _round_up(rows, br)
    if rows_p != rows:
        x2d = jnp.pad(x2d, ((0, rows_p - rows), (0, 0)))
    s1r, b1r = _replicate_bias(s1), _replicate_bias(b1)
    s2r, b2r = _replicate_bias(s2), _replicate_bias(b2)
    const = lambda r: pl.BlockSpec(  # noqa: E731 - whole-array, fetched once
        r.shape, lambda n: (0,) * r.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel_int8,
        grid=(rows_p // br,),
        in_specs=[
            pl.BlockSpec((br, h), lambda n: (n, 0), memory_space=pltpu.VMEM),
            const(q1), const(s1r), const(b1r),
            const(q2), const(s2r), const(b2r),
        ],
        out_specs=pl.BlockSpec((br, h), lambda n: (n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, h), cdt),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows_p * h * i,
            bytes_accessed=2 * rows_p * h * jnp.dtype(cdt).itemsize + 2 * h * i,
            transcendentals=rows_p * i,
        ),
    )(x2d, q1, s1r, b1r, q2, s2r, b2r)
    out = out[:rows] if rows_p != rows else out
    return out.reshape(*x.shape[:-1], h)


ffn_int8_reference = _ffn_int8_reference
