"""Flash-style tiled attention Pallas TPU kernel (long sequences).

The resident kernel in ``attention.py`` keeps the full [Sq, Skv] score
matrix in VMEM — measured fastest up to seq 512 on v5e, but VMEM-bound
beyond that. This module lifts the sequence ceiling with the classic
online-softmax tiling: the grid walks (batch, head, q-block, kv-block),
a VMEM accumulator carries the running (max, sum, weighted-V) statistics
across kv-blocks, and scores only ever exist one [block_q, block_kv] tile
at a time. Backward is the standard two-pass recomputation — one kernel
accumulates (dk, dv) over q-blocks, a second accumulates dq over
kv-blocks — driven by the forward's saved per-row logsumexp and the
precomputed delta = rowsum(dout * out).

Dropout (attention-prob dropout, as in the reference's torch chains —
vilbert_facebook_arch.py:253-294) is generated *inside* the kernel from a
counter-based hash of the global (batch·head, row, col) coordinates, so:
- no [B, H, Sq, Skv] bit tensor ever exists in HBM (at seq 4096 that
  would be gigabytes), and
- the backward regenerates the identical mask from the same coordinates
  regardless of tile sizes, and the plain-XLA twin (`reference_attention`)
  can reproduce the exact bits for parity tests on any backend.

Selected automatically by ``maybe_fused_attention`` when sequences exceed
the resident kernel's MAX_SEQ; like all Pallas kernels here it is opt-in
via ``config.use_pallas_attention`` (XLA measured faster at the flagship
≤128-token shapes).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_SEQ = 8192
DEFAULT_BLOCK = 256
_NEG_BIG = -1e9   # additive-mask magnitude used for padded keys
_M_INIT = -1e30   # running-max init; any real (or -1e9-masked) score exceeds it


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


# --- counter-based dropout bits (shared by kernel and XLA twin) -------------


def _fmix32(x: jnp.ndarray) -> jnp.ndarray:
    """32-bit avalanche mix (splitmix-style finalizer)."""
    x = x ^ (x >> np.uint32(16))
    x = x * np.uint32(0x7FEB352D)
    x = x ^ (x >> np.uint32(15))
    x = x * np.uint32(0x846CA68B)
    x = x ^ (x >> np.uint32(16))
    return x


def hash_bits(seed0, seed1, bh, rows, cols) -> jnp.ndarray:
    """uint32 bits for global coordinates (broadcastable rows/cols).

    Tile-size independent: depends only on (seed, batch·head, row, col),
    so forward/backward kernels and the XLA twin all regenerate the same
    stream.
    """
    rows = rows.astype(jnp.uint32)
    cols = cols.astype(jnp.uint32)
    bh = jnp.asarray(bh, jnp.uint32)
    r = _fmix32(rows * np.uint32(0x9E3779B1) + seed0)
    c = _fmix32(cols * np.uint32(0x85EBCA77) + seed1)
    return _fmix32((r ^ c) + _fmix32(bh * np.uint32(0xC2B2AE3D) + np.uint32(1)))


def keep_threshold(rate: float) -> int:
    return min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1)


def _tile_bits(seed_ref, bh, iq, ikv, bq, bkv):
    rows = jax.lax.broadcasted_iota(jnp.uint32, (bq, bkv), 0) + jnp.uint32(iq * bq)
    cols = jax.lax.broadcasted_iota(jnp.uint32, (bq, bkv), 1) + jnp.uint32(ikv * bkv)
    return hash_bits(seed_ref[0], seed_ref[1], bh, rows, cols)


def reference_attention(q, k, v, bias, rate, seeds):
    """Plain-XLA twin generating the *identical* dropout stream (parity
    oracle for the kernels; any backend)."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    if rate > 0.0:
        bh_idx = jnp.arange(b * h, dtype=jnp.uint32).reshape(b, h, 1, 1)
        rows = jnp.arange(sq, dtype=jnp.uint32).reshape(1, 1, sq, 1)
        cols = jnp.arange(skv, dtype=jnp.uint32).reshape(1, 1, 1, skv)
        bits = hash_bits(jnp.uint32(seeds[0]), jnp.uint32(seeds[1]), bh_idx, rows, cols)
        keep = bits >= jnp.uint32(keep_threshold(rate))
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(v.dtype)


# --- kernels ----------------------------------------------------------------


def _fwd_kernel(refs, o_ref, lse_ref, acc_ref, m_ref, l_ref, *,
                scale, has_bias, thresh, inv_keep, nkv, nheads, bq, bkv):
    it = iter(refs)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    seed_ref = next(it) if thresh is not None else None

    bi, hi, iq, ikv = (pl.program_id(i) for i in range(4))

    @pl.when(ikv == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _M_INIT)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(jnp.float32)          # [bq, D]
    k = k_ref[0, 0].astype(jnp.float32)          # [bkv, D]
    v = v_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                     # [bq, bkv]
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)

    m_prev = m_ref[:, :1]                         # [bq, 1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    e = jnp.exp(s - m_new)                        # unnormalised probs
    l_new = l_prev * corr + jnp.sum(e, axis=-1, keepdims=True)
    if thresh is not None:
        bits = _tile_bits(seed_ref, bi * nheads + hi, iq, ikv, bq, bkv)
        e_v = jnp.where(bits >= jnp.uint32(thresh), e * inv_keep, 0.0)
    else:
        e_v = e
    acc_ref[...] = acc_ref[...] * corr + jnp.dot(
        e_v, v, preferred_element_type=jnp.float32
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ikv == nkv - 1)
    def _finish():
        l = l_ref[:, :1]
        o_ref[0, 0] = (acc_ref[...] / l).astype(o_ref.dtype)
        lse = (m_ref[:, :1] + jnp.log(l)).reshape(1, bq)   # [1, bq]
        lse_ref[0, 0] = jnp.broadcast_to(lse, (8, bq))


def _recompute_p(q, k, bias_ref, lse, scale):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    return jnp.exp(s - lse[:, None]), s


def _dkv_kernel(refs, dk_ref, dv_ref, dk_acc, dv_acc, *,
                scale, has_bias, thresh, inv_keep, nq, nheads, bq, bkv):
    it = iter(refs)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    seed_ref = next(it) if thresh is not None else None
    lse_ref, delta_ref, do_ref = next(it), next(it), next(it)

    bi, hi, ikv, iq = (pl.program_id(i) for i in range(4))

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)         # [bq, D]
    p, _ = _recompute_p(q, k, bias_ref, lse_ref[0, 0, 0, :], scale)  # [bq, bkv]
    if thresh is not None:
        keep = _tile_bits(seed_ref, bi * nheads + hi, iq, ikv, bq, bkv) >= jnp.uint32(thresh)
        pd = jnp.where(keep, p * inv_keep, 0.0)
    else:
        pd = p
    # o = pd @ v ⇒ dv += pdᵀ do ; dpd = do vᵀ
    dv_acc[...] += jax.lax.dot_general(
        pd, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dpd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jnp.where(keep, dpd * inv_keep, 0.0) if thresh is not None else dpd
    # softmax VJP with the flash delta: ds = p ⊙ (dp − delta)
    ds = p * (dp - delta_ref[0, 0, 0, :][:, None])
    dk_acc[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    @pl.when(iq == nq - 1)
    def _finish():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _dq_kernel(refs, dq_ref, dq_acc, *,
               scale, has_bias, thresh, inv_keep, nkv, nheads, bq, bkv):
    it = iter(refs)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    seed_ref = next(it) if thresh is not None else None
    lse_ref, delta_ref, do_ref = next(it), next(it), next(it)

    bi, hi, iq, ikv = (pl.program_id(i) for i in range(4))

    @pl.when(ikv == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    p, _ = _recompute_p(q, k, bias_ref, lse_ref[0, 0, 0, :], scale)
    dpd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if thresh is not None:
        keep = _tile_bits(seed_ref, bi * nheads + hi, iq, ikv, bq, bkv) >= jnp.uint32(thresh)
        dp = jnp.where(keep, dpd * inv_keep, 0.0)
    else:
        dp = dpd
    ds = p * (dp - delta_ref[0, 0, 0, :][:, None])
    dq_acc[...] += jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale

    @pl.when(ikv == nkv - 1)
    def _finish():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


# --- padding / specs --------------------------------------------------------


def _choose_blocks(sq_p, skv_p, block_q, block_kv):
    return min(block_q, sq_p), min(block_kv, skv_p)


def _pad_inputs(q, k, v, bias, bq, bkv):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    sq_p = _round_up(sq, bq)
    skv_p = _round_up(skv, bkv)
    if bias is None and skv_p != skv:
        bias = jnp.zeros((1, 1, 1, skv), jnp.float32)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if skv_p != skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    if bias is not None:
        bb, bh, bqd, _ = bias.shape
        bias = bias.astype(jnp.float32)
        if bqd != 1:  # pad the (non-broadcast) query dim with zeros
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
        # padded keys masked out (finite large-negative keeps exp() exact 0
        # after the running-max subtraction without inf−inf NaNs)
        bias = jnp.pad(
            bias, ((0, 0), (0, 0), (0, 0), (0, skv_p - skv)),
            constant_values=_NEG_BIG,
        )
    return q, k, v, bias, (b, h, sq, skv, sq_p, skv_p, d)


def _qkv_specs(bq, bkv, d, q_index, kv_index):
    mk = lambda blk, idx: pl.BlockSpec((1, 1, blk, d), idx, memory_space=pltpu.VMEM)
    return [mk(bq, q_index), mk(bkv, kv_index), mk(bkv, kv_index)]


def _bias_spec(bias, b, h, bq, bkv, qi, kvi):
    """BlockSpec honouring broadcast (size-1) bias dims."""
    bb, bh, bqd, _ = bias.shape
    bq_blk = bq if bqd != 1 else 1

    def idx(i, j, a, c):
        return (i if bb != 1 else 0, j if bh != 1 else 0,
                qi(i, j, a, c) if bqd != 1 else 0, kvi(i, j, a, c))

    return pl.BlockSpec((1, 1, bq_blk, bkv), idx, memory_space=pltpu.VMEM)


def _row_spec(bq, qi):
    """Per-row stats (lse/delta) live as [B, H, 8, Sq_p] — the row value
    replicated over 8 sublanes so the (8, 128) Mosaic tiling rule holds with
    only 8× storage (a flat [B, H, Sq] layout is rejected by the compiled
    lowering; [.., Sq, 128] lane replication would be 128×)."""
    return pl.BlockSpec((1, 1, 8, bq),
                        lambda i, j, a, c: (i, j, 0, qi(i, j, a, c)),
                        memory_space=pltpu.VMEM)


def _seeds_from_rng(rng):
    return jax.random.bits(rng, (2,), jnp.uint32)


# --- host-side drivers ------------------------------------------------------


def _run_forward(q, k, v, bias, seeds, rate, block_q, block_kv):
    bq0, bkv0 = _choose_blocks(_round_up(q.shape[2], 8), _round_up(k.shape[2], 8),
                               block_q, block_kv)
    qp, kp, vp, biasp, (b, h, sq, skv, sq_p, skv_p, d) = _pad_inputs(q, k, v, bias, bq0, bkv0)
    bq, bkv = _choose_blocks(sq_p, skv_p, block_q, block_kv)
    nq, nkv = sq_p // bq, skv_p // bkv
    has_bias = biasp is not None
    thresh = keep_threshold(rate) if rate > 0.0 else None

    qi = lambda i, j, a, c: a       # q-block index within grid (b,h,nq,nkv)
    kvi = lambda i, j, a, c: c
    args = [qp, kp, vp]
    in_specs = _qkv_specs(bq, bkv, d, lambda i, j, a, c: (i, j, qi(i, j, a, c), 0),
                          lambda i, j, a, c: (i, j, kvi(i, j, a, c), 0))
    if has_bias:
        args.append(biasp)
        in_specs.append(_bias_spec(biasp, b, h, bq, bkv, qi, kvi))
    if thresh is not None:
        args.append(seeds)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    kernel = functools.partial(
        lambda *a, **kw: _fwd_kernel(a[:-5], a[-5], a[-4], a[-3], a[-2], a[-1], **kw),
        scale=1.0 / (d ** 0.5), has_bias=has_bias, thresh=thresh,
        inv_keep=1.0 / (1.0 - rate) if rate > 0.0 else 1.0,
        nkv=nkv, nheads=h, bq=bq, bkv=bkv,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, h, nq, nkv),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, bq, d), lambda i, j, a, c: (i, j, a, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(bq, qi),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sq_p, d), v.dtype),
            jax.ShapeDtypeStruct((b, h, 8, sq_p), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (sq_p * skv_p * d * 2),
            bytes_accessed=(qp.size + kp.size + vp.size) * q.dtype.itemsize,
            transcendentals=b * h * sq_p * skv_p,
        ),
    )(*args)
    if sq_p != sq:
        out = out[:, :, :sq, :]
    return out, lse


def _run_backward(q, k, v, bias, seeds, rate, lse, out, g, block_q, block_kv):
    bq0, bkv0 = _choose_blocks(_round_up(q.shape[2], 8), _round_up(k.shape[2], 8),
                               block_q, block_kv)
    qp, kp, vp, biasp, (b, h, sq, skv, sq_p, skv_p, d) = _pad_inputs(q, k, v, bias, bq0, bkv0)
    bq, bkv = _choose_blocks(sq_p, skv_p, block_q, block_kv)
    nq, nkv = sq_p // bq, skv_p // bkv
    has_bias = biasp is not None
    thresh = keep_threshold(rate) if rate > 0.0 else None
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    scale = 1.0 / (d ** 0.5)

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # [b,h,sq]
    if sq_p != sq:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq)))
    # match the forward's sublane-replicated row-stat layout [B, H, 8, Sq_p].
    # Padded query rows are harmless: their g is 0 so delta = 0 and every
    # gradient contribution through them vanishes (dpd = 0, pd·do = 0).
    delta = jnp.broadcast_to(delta[:, :, None, :], (b, h, 8, sq_p))
    lse_p = lse  # [b, h, 8, sq_p] from the forward

    def common(qi, kvi):
        args = [qp, kp, vp]
        specs = _qkv_specs(bq, bkv, d, lambda i, j, a, c: (i, j, qi(i, j, a, c), 0),
                           lambda i, j, a, c: (i, j, kvi(i, j, a, c), 0))
        if has_bias:
            args.append(biasp)
            specs.append(_bias_spec(biasp, b, h, bq, bkv, qi, kvi))
        if thresh is not None:
            args.append(seeds)
            specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.extend([lse_p, delta, g])
        specs.extend([
            _row_spec(bq, qi), _row_spec(bq, qi),
            pl.BlockSpec((1, 1, bq, d), lambda i, j, a, c: (i, j, qi(i, j, a, c), 0),
                         memory_space=pltpu.VMEM),
        ])
        return args, specs

    # pass 1: dk, dv — grid (b, h, nkv, nq), q innermost
    qi1 = lambda i, j, a, c: c
    kvi1 = lambda i, j, a, c: a
    args1, specs1 = common(qi1, kvi1)
    kernel1 = functools.partial(
        lambda *a, **kw: _dkv_kernel(a[:-4], a[-4], a[-3], a[-2], a[-1], **kw),
        scale=scale, has_bias=has_bias, thresh=thresh, inv_keep=inv_keep,
        nq=nq, nheads=h, bq=bq, bkv=bkv,
    )
    dk, dv = pl.pallas_call(
        kernel1,
        grid=(b, h, nkv, nq),
        in_specs=specs1,
        out_specs=(
            pl.BlockSpec((1, 1, bkv, d), lambda i, j, a, c: (i, j, a, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), lambda i, j, a, c: (i, j, a, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, skv_p, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, skv_p, d), v.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((bkv, d), jnp.float32),
                        pltpu.VMEM((bkv, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * b * h * (sq_p * skv_p * d * 2),
            bytes_accessed=(qp.size + kp.size + vp.size + g.size) * q.dtype.itemsize,
            transcendentals=b * h * sq_p * skv_p,
        ),
    )(*args1)

    # pass 2: dq — grid (b, h, nq, nkv), kv innermost
    qi2 = lambda i, j, a, c: a
    kvi2 = lambda i, j, a, c: c
    args2, specs2 = common(qi2, kvi2)
    kernel2 = functools.partial(
        lambda *a, **kw: _dq_kernel(a[:-2], a[-2], a[-1], **kw),
        scale=scale, has_bias=has_bias, thresh=thresh, inv_keep=inv_keep,
        nkv=nkv, nheads=h, bq=bq, bkv=bkv,
    )
    dq = pl.pallas_call(
        kernel2,
        grid=(b, h, nq, nkv),
        in_specs=specs2,
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda i, j, a, c: (i, j, a, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (sq_p * skv_p * d * 2),
            bytes_accessed=(qp.size + kp.size + g.size) * q.dtype.itemsize,
            transcendentals=b * h * sq_p * skv_p,
        ),
    )(*args2)
    if sq_p != sq:
        dq = dq[:, :, :sq, :]
    if skv_p != skv:
        dk = dk[:, :, :skv, :]
        dv = dv[:, :, :skv, :]
    return dq, dk, dv


# --- public entry -----------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash(q, k, v, bias, seeds, rate, block_q, block_kv):
    out, _ = _run_forward(q, k, v, bias, seeds, rate, block_q, block_kv)
    return out


def _flash_fwd(q, k, v, bias, seeds, rate, block_q, block_kv):
    out, lse = _run_forward(q, k, v, bias, seeds, rate, block_q, block_kv)
    return out, (q, k, v, bias, seeds, lse, out)


def _flash_bwd(rate, block_q, block_kv, res, g):
    q, k, v, bias, seeds, lse, out = res
    dq, dk, dv = _run_backward(q, k, v, bias, seeds, rate, lse, out, g,
                               block_q, block_kv)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, bias=None, dropout_rate: float = 0.0,
                    dropout_rng: Optional[jax.Array] = None,
                    block_q: int = DEFAULT_BLOCK, block_kv: int = DEFAULT_BLOCK):
    """Tiled online-softmax attention; gradients via the two-pass flash
    backward. Dropout (rate > 0) requires ``dropout_rng``."""
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        seeds = _seeds_from_rng(dropout_rng)
    else:
        seeds = jnp.zeros((2,), jnp.uint32)
    return _flash(q, k, v, bias, seeds, float(dropout_rate), block_q, block_kv)
