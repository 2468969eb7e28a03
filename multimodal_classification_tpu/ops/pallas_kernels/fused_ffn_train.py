"""Fused FFN residual BLOCK Pallas TPU kernels for TRAINING (fwd + bwd).

One forward kernel computes the whole post-LN BERT FFN sub-block —

    y = LayerNorm(x + dropout(gelu(x @ W1 + b1) @ W2 + b2))

— and one backward kernel produces dx plus the per-row tensors the weight
gradients need, so the block's backward is a single Pallas call followed by
two plain XLA matmuls (dW1, dW2) and four reductions.

Why: the 22 ms flagship TRAIN step is dominated by per-op dispatch overhead
(per-op profile: 59% of device time across ~1480 small fusions, no single
hotspot — docs/PERFORMANCE.md), exactly the overhead class that layer-
granularity fusion removed at eval (+48% at batch 16 from the fused text
layer). This module plays the same card for training: the unfused FFN block
costs ~6 forward fusions and ~10 backward fusions per layer; fused it is one
kernel each way plus two large single-op matmuls XLA runs at full MXU rate.

Dropout (the block's output dropout, reference chain BertIntermediate →
BertOutput → Dropout → LayerNorm residual, vilbert_core.py:167-201) is
generated *inside* the kernel from the same counter-based hash the flash
attention kernel uses (flash_attention.py::hash_bits): the mask never exists
in HBM, the backward regenerates identical bits from the global (row, col)
coordinates, and the XLA twin (``ffn_block_reference``) reproduces the exact
stream for parity tests on any backend.

Backward math (all f32 in-kernel):
    LN:    zhat = (z - mean) * rstd;  ggamma = dy * gamma
           dz = rstd * (ggamma - mean(ggamma) - zhat * mean(ggamma * zhat))
    drop:  dd = mask * dz * inv_keep        (mask regenerated from the hash)
    FFN:   u = x @ W1 + b1 (recomputed);  a = gelu(u)
           da = dd @ W2ᵀ;  du = da * gelu'(u);  dx = dz + du @ W1ᵀ
    exported for XLA:  a, du, dd  →  dW1 = xᵀ @ du,  dW2 = aᵀ @ dd,
           db1 = Σdu, db2 = Σdd, dgamma = Σ(dy·zhat), dbeta = Σdy
The exported per-row tensors are rounded to the compute dtype (bf16) — the
same rounding the unfused XLA backward applies to its dot cotangents.

Numerics: both kernels mirror the unfused model path's dtype discipline
(bf16 dense outputs with f32 MXU accumulation, f32 GELU via the A&S 7.1.26
erf polynomial — Mosaic has no erf lowering — f32 residual + LayerNorm).

VMEM: the backward keeps W1 + W2 resident (text 768×3072 bf16 ×2 ≈ 9.4 MB)
and streams small row blocks; the visual 1024×4096 stream exceeds the budget
and keeps the unfused XLA path (``supported_train``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_classification_tpu.ops.pallas_kernels.flash_attention import (
    hash_bits,
    keep_threshold,
)
from multimodal_classification_tpu.ops.pallas_kernels.fused_ffn import (
    _erf,
    _replicate_bias,
)

_SUBLANE = 8
_LANE = 128
_VMEM_BUDGET = 13 * 2 ** 20
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _block_rows_fwd(h: int, i: int, itemsize: int) -> int:
    weights = 2 * h * i * itemsize
    for br in (512, 256, 128, 64, 32):
        # x in / y out double-buffered, z out (f32), f32 intermediate + GELU
        # temp, dropout bits
        working = weights + br * (4 * h * itemsize + 2 * h * 4 + 3 * i * 4)
        if working <= _VMEM_BUDGET:
            return br
    return 0


def _block_rows_bwd(h: int, i: int, itemsize: int) -> int:
    weights = 2 * h * i * itemsize
    for br in (256, 128, 64, 32, 16):
        working = weights + br * (
            6 * h * itemsize      # x, dy, dx, dd blocks (double-buffered in/out)
            + 2 * h * 4           # z (f32 in)
            + 4 * i * itemsize    # a, du outputs
            + 4 * i * 4           # u, da, gelu' f32 temps
            + 2 * h * 4           # LN temps
        )
        if working <= _VMEM_BUDGET:
            return br
    return 0


def _chunk_cols_fwd(rows: int, h: int, i: int, itemsize: int) -> int:
    """Column-chunk width for the I-grid forward (all rows resident)."""
    for ic in (1024, 768, 512, 384, 256, 128):
        if i % ic:
            continue
        working = (
            rows * h * (3 * itemsize + 3 * 4)  # x const, y/z out, f_acc + LN
            + 2 * h * ic * itemsize            # w1/w2 chunks (double-buffered ~2x)
            + rows * ic * (4 + itemsize)       # u f32 + a cdt
        )
        if working <= _VMEM_BUDGET:
            return ic
    return 0


def _chunk_cols_bwd(rows: int, h: int, i: int, itemsize: int) -> int:
    """Column-chunk width for the I-grid backward (all rows resident)."""
    for ic in (1024, 768, 512, 384, 256, 128):
        if i % ic:
            continue
        working = (
            rows * h * (4 * itemsize + 4 + 3 * 4)  # x/dy/dx/dd, z f32, dz+acc
            + 2 * h * ic * itemsize                # w1/w2 chunks
            + rows * ic * (3 * 4 + 2 * itemsize)   # u/da/du f32 + a/du exports
        )
        if working <= _VMEM_BUDGET:
            return ic
    return 0


# All-rows-resident threshold: above this the I-grid strategy's row-resident
# buffers outgrow VMEM and the row-grid strategy takes over. The flagship
# TRAIN shapes (batch 16 x 32-token bucket = 512 rows) sit under it — the
# point of the I-grid: 512-row MXU dots instead of the row-grid backward's
# 32-row blocks (weights resident leaves <4 MB for rows at 768/3072 bf16,
# and a 32-row dot uses a quarter of the MXU's row dimension).
_COLS_MAX_ROWS = 640


def _round8(x: int) -> int:
    return _round_up(x, _SUBLANE)


def supported_train(h: int, i: int, dtype, rows: int = 0) -> bool:
    if h % _LANE or i % _LANE:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if rows and _round8(rows) <= _COLS_MAX_ROWS \
            and _chunk_cols_fwd(_round8(rows), h, i, itemsize) > 0 \
            and _chunk_cols_bwd(_round8(rows), h, i, itemsize) > 0:
        return True
    return _block_rows_fwd(h, i, itemsize) > 0 and _block_rows_bwd(h, i, itemsize) > 0


# --- shared dropout bits (global row/col coordinates, tile independent) ----


def _block_keep(seed_ref, n, br, cols, thresh):
    rows = jax.lax.broadcasted_iota(jnp.uint32, (br, cols), 0) + jnp.uint32(n * br)
    cidx = jax.lax.broadcasted_iota(jnp.uint32, (br, cols), 1)
    bits = hash_bits(seed_ref[0], seed_ref[1], jnp.uint32(0), rows, cidx)
    return bits >= jnp.uint32(thresh)


def _gelu_parts(u):
    """(gelu(u), gelu'(u)) in f32 with the in-kernel erf polynomial."""
    phi_cdf = 0.5 * (1.0 + _erf(u * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * u * u) * _INV_SQRT2PI
    return u * phi_cdf, phi_cdf + u * pdf


def _ln_stats(z):
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-12)
    return (z - mu) * rstd, rstd


# --- XLA twin (parity oracle + off-TPU path; identical dropout bits) --------


def ffn_block_reference(x2d, w1, b1, w2, b2, gamma, beta, rate, seeds):
    cdt = x2d.dtype
    u = jax.lax.dot_general(
        x2d, w1.astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1.astype(jnp.float32)
    g, _ = _gelu_parts(u)
    a = g.astype(cdt)
    f = jax.lax.dot_general(
        a, w2.astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2.astype(jnp.float32)
    f = f.astype(cdt).astype(jnp.float32)
    if rate > 0.0:
        rows = jnp.arange(x2d.shape[0], dtype=jnp.uint32)[:, None]
        cols = jnp.arange(x2d.shape[1], dtype=jnp.uint32)[None, :]
        bits = hash_bits(jnp.uint32(seeds[0]), jnp.uint32(seeds[1]),
                         jnp.uint32(0), rows, cols)
        keep = bits >= jnp.uint32(keep_threshold(rate))
        f = jnp.where(keep, f * (1.0 / (1.0 - rate)), 0.0)
    z = x2d.astype(jnp.float32) + f
    zhat, _ = _ln_stats(z)
    y = zhat * gamma.astype(jnp.float32)[None, :] + beta.astype(jnp.float32)[None, :]
    return y.astype(cdt)


# --- kernels -----------------------------------------------------------------


def _fwd_kernel(refs, o_ref, z_ref, *, thresh, inv_keep, br, hdim):
    it = iter(refs)
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, bt_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it), next(it))
    seed_ref = next(it) if thresh is not None else None
    x = x_ref[:]
    u = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    u = u + b1_ref[0:1, :].astype(jnp.float32)
    g, _ = _gelu_parts(u)
    a = g.astype(x.dtype)
    f = jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)
    f = (f + b2_ref[0:1, :].astype(jnp.float32)).astype(x.dtype).astype(jnp.float32)
    if thresh is not None:
        keep = _block_keep(seed_ref, pl.program_id(0), br, hdim, thresh)
        f = jnp.where(keep, f * inv_keep, 0.0)
    z = x.astype(jnp.float32) + f
    zhat, _ = _ln_stats(z)
    y = zhat * g_ref[0:1, :] + bt_ref[0:1, :]
    o_ref[:] = y.astype(o_ref.dtype)
    z_ref[:] = z


def _bwd_kernel(refs, dx_ref, a_ref, du_ref, dd_ref, *,
                thresh, inv_keep, br, hdim):
    it = iter(refs)
    x_ref, z_ref, dy_ref, w1_ref, b1_ref, w2_ref, g_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it), next(it))
    seed_ref = next(it) if thresh is not None else None
    x = x_ref[:]
    z = z_ref[:]
    dy = dy_ref[:].astype(jnp.float32)
    zhat, rstd = _ln_stats(z)
    gg = dy * g_ref[0:1, :]
    dz = rstd * (
        gg
        - jnp.mean(gg, axis=-1, keepdims=True)
        - zhat * jnp.mean(gg * zhat, axis=-1, keepdims=True)
    )
    if thresh is not None:
        keep = _block_keep(seed_ref, pl.program_id(0), br, hdim, thresh)
        dd = jnp.where(keep, dz * inv_keep, 0.0)
    else:
        dd = dz
    dd_c = dd.astype(x.dtype)
    u = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    u = u + b1_ref[0:1, :].astype(jnp.float32)
    g, gp = _gelu_parts(u)
    da = jax.lax.dot_general(
        dd_c, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    du = da * gp
    du_c = du.astype(x.dtype)
    dxc = jax.lax.dot_general(
        du_c, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[:] = (dz + dxc).astype(dx_ref.dtype)
    a_ref[:] = g.astype(a_ref.dtype)
    du_ref[:] = du_c
    dd_ref[:] = dd_c


def _fwd_cols_kernel(refs, o_ref, z_ref, f_acc, *,
                     thresh, inv_keep, nchunks, hdim):
    """I-grid forward: all rows resident, grid over intermediate chunks.
    Same math and dropout stream as the row-grid kernel (f32 partial sums
    over chunks equal one f32-accumulated dot up to summation order)."""
    it = iter(refs)
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, bt_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it), next(it))
    seed_ref = next(it) if thresh is not None else None
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        f_acc[...] = jnp.zeros_like(f_acc)

    x = x_ref[:]
    u = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    u = u + b1_ref[0:1, :].astype(jnp.float32)
    g, _ = _gelu_parts(u)
    a = g.astype(x.dtype)
    f_acc[...] += jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == nchunks - 1)
    def _finish():
        f = (f_acc[...] + b2_ref[0:1, :].astype(jnp.float32))
        f = f.astype(x.dtype).astype(jnp.float32)
        if thresh is not None:
            keep = _block_keep(seed_ref, 0, x.shape[0], hdim, thresh)
            f = jnp.where(keep, f * inv_keep, 0.0)
        z = x.astype(jnp.float32) + f
        zhat, _ = _ln_stats(z)
        o_ref[:] = (zhat * g_ref[0:1, :] + bt_ref[0:1, :]).astype(o_ref.dtype)
        z_ref[:] = z


def _bwd_cols_kernel(refs, dx_ref, a_ref, du_ref, dd_ref, dx_acc, *,
                     thresh, inv_keep, nchunks, hdim):
    """I-grid backward: all rows resident; the LN/dropout backward is
    recomputed per chunk (cheap elementwise) while every dot runs at the
    full row count."""
    it = iter(refs)
    x_ref, z_ref, dy_ref, w1_ref, b1_ref, w2_ref, g_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it), next(it))
    seed_ref = next(it) if thresh is not None else None
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        dx_acc[...] = jnp.zeros_like(dx_acc)

    x = x_ref[:]
    z = z_ref[:]
    dy = dy_ref[:].astype(jnp.float32)
    zhat, rstd = _ln_stats(z)
    gg = dy * g_ref[0:1, :]
    dz = rstd * (
        gg
        - jnp.mean(gg, axis=-1, keepdims=True)
        - zhat * jnp.mean(gg * zhat, axis=-1, keepdims=True)
    )
    if thresh is not None:
        keep = _block_keep(seed_ref, 0, x.shape[0], hdim, thresh)
        dd = jnp.where(keep, dz * inv_keep, 0.0)
    else:
        dd = dz
    dd_c = dd.astype(x.dtype)

    u = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    u = u + b1_ref[0:1, :].astype(jnp.float32)
    g, gp = _gelu_parts(u)
    da = jax.lax.dot_general(
        dd_c, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    du = da * gp
    du_c = du.astype(x.dtype)
    dx_acc[...] += jax.lax.dot_general(
        du_c, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a_ref[:] = g.astype(a_ref.dtype)
    du_ref[:] = du_c

    @pl.when(j == 0)
    def _dd():
        dd_ref[:] = dd_c

    @pl.when(j == nchunks - 1)
    def _finish():
        dx_ref[:] = (dz + dx_acc[...]).astype(dx_ref.dtype)


# --- drivers -----------------------------------------------------------------


def _const_spec(a):
    return pl.BlockSpec(a.shape, lambda n: (0,) * a.ndim, memory_space=pltpu.VMEM)


def _run_fwd_cols(x2d, w1, b1, w2, b2, gamma, beta, seeds, rate, ic):
    rows, h = x2d.shape
    i = w1.shape[1]
    cdt = x2d.dtype
    rows_p = _round8(rows)
    if rows_p != rows:
        x2d = jnp.pad(x2d, ((0, rows_p - rows), (0, 0)))
    w1c, w2c = w1.astype(cdt), w2.astype(cdt)
    thresh = keep_threshold(rate) if rate > 0.0 else None
    operands = [
        x2d, w1c, _replicate_bias(b1), w2c, _replicate_bias(b2),
        _replicate_bias(gamma), _replicate_bias(beta),
    ]
    whole = pl.BlockSpec((rows_p, h), lambda j: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        whole,
        pl.BlockSpec((h, ic), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((_SUBLANE, ic), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((ic, h), lambda j: (j, 0), memory_space=pltpu.VMEM),
        _const_spec(operands[4]),
        _const_spec(operands[5]),
        _const_spec(operands[6]),
    ]
    if thresh is not None:
        operands.append(seeds)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    y, z = pl.pallas_call(
        functools.partial(
            lambda *a, **kw: _fwd_cols_kernel(a[:-3], a[-3], a[-2], a[-1], **kw),
            thresh=thresh,
            inv_keep=1.0 / (1.0 - rate) if rate > 0.0 else 1.0,
            nchunks=i // ic, hdim=h,
        ),
        grid=(i // ic,),
        in_specs=in_specs,
        out_specs=(whole, whole),
        out_shape=(
            jax.ShapeDtypeStruct((rows_p, h), cdt),
            jax.ShapeDtypeStruct((rows_p, h), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((rows_p, h), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * rows_p * h * i,
            bytes_accessed=(2 * rows_p * h + 2 * h * i) * jnp.dtype(cdt).itemsize
            + rows_p * h * 4,
            transcendentals=rows_p * (i + h),
        ),
    )(*operands)
    return (y[:rows], z[:rows]) if rows_p != rows else (y, z)


def _run_bwd_cols(x2d, z, dy, w1, b1, w2, gamma, seeds, rate, ic):
    rows, h = x2d.shape
    i = w1.shape[1]
    cdt = x2d.dtype
    rows_p = _round8(rows)
    if rows_p != rows:
        pad = ((0, rows_p - rows), (0, 0))
        x2d, z, dy = jnp.pad(x2d, pad), jnp.pad(z, pad), jnp.pad(dy, pad)
    w1c, w2c = w1.astype(cdt), w2.astype(cdt)
    thresh = keep_threshold(rate) if rate > 0.0 else None
    operands = [
        x2d, z, dy, w1c, _replicate_bias(b1), w2c, _replicate_bias(gamma),
    ]
    whole = pl.BlockSpec((rows_p, h), lambda j: (0, 0), memory_space=pltpu.VMEM)
    col_i = pl.BlockSpec((rows_p, ic), lambda j: (0, j), memory_space=pltpu.VMEM)
    in_specs = [
        whole, whole, whole,
        pl.BlockSpec((h, ic), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((_SUBLANE, ic), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((ic, h), lambda j: (j, 0), memory_space=pltpu.VMEM),
        _const_spec(operands[6]),
    ]
    if thresh is not None:
        operands.append(seeds)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    dx, a, du, dd = pl.pallas_call(
        functools.partial(
            lambda *a, **kw: _bwd_cols_kernel(
                a[:-5], a[-5], a[-4], a[-3], a[-2], a[-1], **kw),
            thresh=thresh,
            inv_keep=1.0 / (1.0 - rate) if rate > 0.0 else 1.0,
            nchunks=i // ic, hdim=h,
        ),
        grid=(i // ic,),
        in_specs=in_specs,
        out_specs=(whole, col_i, col_i, whole),
        out_shape=(
            jax.ShapeDtypeStruct((rows_p, h), cdt),
            jax.ShapeDtypeStruct((rows_p, i), cdt),
            jax.ShapeDtypeStruct((rows_p, i), cdt),
            jax.ShapeDtypeStruct((rows_p, h), cdt),
        ),
        scratch_shapes=[pltpu.VMEM((rows_p, h), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * rows_p * h * i,
            bytes_accessed=(2 * h * i + 6 * rows_p * h + 2 * rows_p * i)
            * jnp.dtype(cdt).itemsize + rows_p * h * 4,
            transcendentals=rows_p * (i + h),
        ),
    )(*operands)
    if rows_p != rows:
        dx, a, du, dd = dx[:rows], a[:rows], du[:rows], dd[:rows]
    return dx, a, du, dd


def _run_fwd(x2d, w1, b1, w2, b2, gamma, beta, seeds, rate):
    rows, h = x2d.shape
    i = w1.shape[1]
    cdt = x2d.dtype
    if _round8(rows) <= _COLS_MAX_ROWS:
        ic = _chunk_cols_fwd(_round8(rows), h, i, jnp.dtype(cdt).itemsize)
        if ic:
            return _run_fwd_cols(x2d, w1, b1, w2, b2, gamma, beta, seeds,
                                 rate, ic)
    br = _block_rows_fwd(h, i, jnp.dtype(cdt).itemsize)
    if br == 0:
        raise ValueError(
            "fused_ffn_train: shapes exceed the VMEM budget — the "
            "maybe_fused_ffn_train dispatch should have refused this call")
    rows_p = _round_up(rows, br)
    if rows_p != rows:
        x2d = jnp.pad(x2d, ((0, rows_p - rows), (0, 0)))
    w1c, w2c = w1.astype(cdt), w2.astype(cdt)
    thresh = keep_threshold(rate) if rate > 0.0 else None
    operands = [
        x2d, w1c, _replicate_bias(b1), w2c, _replicate_bias(b2),
        _replicate_bias(gamma), _replicate_bias(beta),
    ]
    row = pl.BlockSpec((br, h), lambda n: (n, 0), memory_space=pltpu.VMEM)
    in_specs = [row] + [_const_spec(a) for a in operands[1:]]
    if thresh is not None:
        operands.append(seeds)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    y, z = pl.pallas_call(
        functools.partial(
            lambda *a, **kw: _fwd_kernel(a[:-2], a[-2], a[-1], **kw),
            thresh=thresh,
            inv_keep=1.0 / (1.0 - rate) if rate > 0.0 else 1.0,
            br=br, hdim=h,
        ),
        grid=(rows_p // br,),
        in_specs=in_specs,
        out_specs=(row, pl.BlockSpec((br, h), lambda n: (n, 0),
                                     memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((rows_p, h), cdt),
            jax.ShapeDtypeStruct((rows_p, h), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows_p * h * i,
            bytes_accessed=(2 * rows_p * h + 2 * h * i) * jnp.dtype(cdt).itemsize
            + rows_p * h * 4,
            transcendentals=rows_p * (i + h),
        ),
    )(*operands)
    return (y[:rows], z[:rows]) if rows_p != rows else (y, z)


def _run_bwd(x2d, z, dy, w1, b1, w2, gamma, seeds, rate):
    rows, h = x2d.shape
    i = w1.shape[1]
    cdt = x2d.dtype
    if _round8(rows) <= _COLS_MAX_ROWS:
        ic = _chunk_cols_bwd(_round8(rows), h, i, jnp.dtype(cdt).itemsize)
        if ic:
            return _run_bwd_cols(x2d, z, dy, w1, b1, w2, gamma, seeds,
                                 rate, ic)
    br = _block_rows_bwd(h, i, jnp.dtype(cdt).itemsize)
    if br == 0:
        raise ValueError(
            "fused_ffn_train: shapes exceed the VMEM budget — the "
            "maybe_fused_ffn_train dispatch should have refused this call")
    rows_p = _round_up(rows, br)
    if rows_p != rows:
        pad = ((0, rows_p - rows), (0, 0))
        # padded rows: x = z = dy = 0 → rstd finite, dz = 0, every export 0
        x2d, z, dy = jnp.pad(x2d, pad), jnp.pad(z, pad), jnp.pad(dy, pad)
    w1c, w2c = w1.astype(cdt), w2.astype(cdt)
    thresh = keep_threshold(rate) if rate > 0.0 else None
    operands = [
        x2d, z, dy, w1c, _replicate_bias(b1), w2c, _replicate_bias(gamma),
    ]
    row_h = pl.BlockSpec((br, h), lambda n: (n, 0), memory_space=pltpu.VMEM)
    row_i = pl.BlockSpec((br, i), lambda n: (n, 0), memory_space=pltpu.VMEM)
    in_specs = [row_h, row_h, row_h] + [_const_spec(a_) for a_ in operands[3:]]
    if thresh is not None:
        operands.append(seeds)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    dx, a, du, dd = pl.pallas_call(
        functools.partial(
            lambda *a, **kw: _bwd_kernel(a[:-4], a[-4], a[-3], a[-2], a[-1], **kw),
            thresh=thresh,
            inv_keep=1.0 / (1.0 - rate) if rate > 0.0 else 1.0,
            br=br, hdim=h,
        ),
        grid=(rows_p // br,),
        in_specs=in_specs,
        out_specs=(row_h, row_i, row_i, row_h),
        out_shape=(
            jax.ShapeDtypeStruct((rows_p, h), cdt),
            jax.ShapeDtypeStruct((rows_p, i), cdt),
            jax.ShapeDtypeStruct((rows_p, i), cdt),
            jax.ShapeDtypeStruct((rows_p, h), cdt),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * rows_p * h * i,
            bytes_accessed=(2 * h * i + 6 * rows_p * h + 2 * rows_p * i)
            * jnp.dtype(cdt).itemsize + rows_p * h * 4,
            transcendentals=rows_p * (i + h),
        ),
    )(*operands)
    if rows_p != rows:
        dx, a, du, dd = dx[:rows], a[:rows], du[:rows], dd[:rows]
    return dx, a, du, dd


# --- custom_vjp entry ---------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _block(x2d, w1, b1, w2, b2, gamma, beta, seeds, rate):
    y, _ = _run_fwd(x2d, w1, b1, w2, b2, gamma, beta, seeds, rate)
    return y


def _block_fwd(x2d, w1, b1, w2, b2, gamma, beta, seeds, rate):
    y, z = _run_fwd(x2d, w1, b1, w2, b2, gamma, beta, seeds, rate)
    return y, (x2d, w1, b1, w2, gamma, seeds, z)


def _block_bwd(rate, res, g):
    x2d, w1, b1, w2, gamma, seeds, z = res
    dx, a, du, dd = _run_bwd(x2d, z, g, w1, b1, w2, gamma, seeds, rate)
    # weight gradients: two large single-op matmuls (full MXU rate in XLA)
    dw1 = jax.lax.dot_general(
        x2d, du, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dw2 = jax.lax.dot_general(
        a, dd, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1 = jnp.sum(du.astype(jnp.float32), axis=0)
    db2 = jnp.sum(dd.astype(jnp.float32), axis=0)
    gf = g.astype(jnp.float32)
    zhat, _ = _ln_stats(z)
    dgamma = jnp.sum(gf * zhat, axis=0)
    dbeta = jnp.sum(gf, axis=0)
    return dx, dw1, db1, dw2, db2, dgamma, dbeta, None


_block.defvjp(_block_fwd, _block_bwd)


def fused_ffn_block_train(x, w1, b1, w2, b2, gamma, beta,
                          dropout_rate: float, dropout_rng=None):
    """Training FFN residual block over the last axis of ``x``:
    ``LN(x + dropout(gelu(x@W1+b1)@W2+b2))`` with the whole forward in one
    Pallas pass and the backward in one Pallas pass + two XLA matmuls.

    ``w1: [H, I]``, ``b1: [I]``, ``w2: [I, H]``, ``b2/gamma/beta: [H]``
    (float32 params). Differentiable in all seven tensor operands.
    ``dropout_rate > 0`` requires ``dropout_rng``.
    """
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        seeds = jax.random.bits(dropout_rng, (2,), jnp.uint32)
    else:
        seeds = jnp.zeros((2,), jnp.uint32)
    h = x.shape[-1]
    assert w1.shape[0] == h and w2.shape == (w1.shape[1], h)
    y = _block(x.reshape(-1, h), w1, b1, w2, b2, gamma, beta, seeds,
               float(dropout_rate))
    return y.reshape(*x.shape[:-1], h)
