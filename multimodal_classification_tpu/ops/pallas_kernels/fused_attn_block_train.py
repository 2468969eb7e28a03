"""Fused self-attention BLOCK Pallas TPU kernels for TRAINING (fwd + bwd).

One forward kernel computes the whole post-LN BERT attention sub-block —

    q/k/v projections → masked softmax attention (attention-prob dropout)
    → output projection → output dropout → LayerNorm(x + out)

— and one backward kernel recomputes the attention internals and produces
dx plus the per-row tensors the weight gradients need, so the block's
backward is one Pallas call followed by four single-op XLA matmuls
(dWq/dWk/dWv from x, dWo from the recomputed context) and six reductions.

Training twin of ``fused_attn_block.py`` (eval); same motivation as
``fused_ffn_train.py``: the flagship train step is per-op-overhead-bound
(59% of device time across ~1480 small fusions — docs/PERFORMANCE.md), and
the unfused attention block costs ~12 forward and ~20 backward fusions per
layer. Reference chain: BertSelfAttention → BertSelfOutput
(vilbert_core.py:41-166 / vilbert_facebook_arch.py:110-221).

Both dropouts are generated in-kernel from the flash kernel's counter hash
(flash_attention.py::hash_bits) with LAYOUT-INDEPENDENT coordinates, so the
backward and the XLA twin regenerate identical bits regardless of block
sizes:
  - attention probs:  seeds[0:2], bh = item·num_heads + head,
                      rows = q position, cols = k position
  - output dropout:   seeds[2:4], bh = item, rows = q position, cols = channel

Backward math (f32 in-kernel; the standard attention VJP):
    LN:      dz from (z, gamma) as in fused_ffn_train
    out:     dd = mask_h · dz · inv_h;   dctx = dd @ Woᵀ
    attn:    p recomputed exactly (same max-subtracted softmax);
             pd = mask_a · p · inv_a;  ctx_h = pd @ v_h (recomputed, exported)
             dv = pdᵀ @ dctx;  dpd = dctx @ vᵀ;  dp = mask_a · dpd · inv_a
             ds = p ⊙ (dp − rowsum(dp ⊙ p));  dq = ds @ k · scale;
             dk = dsᵀ @ q · scale
    x:       dx = dz + dq @ Wqᵀ + dk @ Wkᵀ + dv @ Wvᵀ
    exports: dq, dk, dv, dd, ctx (rounded to the compute dtype — the same
             rounding the unfused XLA backward applies to dot cotangents)

Grid: one program per block of ``bb`` whole (row-padded) batch items, like
the eval kernel; attention is block-diagonal over items. The layout picker
sizes ONE (s_p, bb) for forward and backward together (the saved pre-LN
residual z must pad identically both ways). Text layers (768-d) use the
single-pass backward; the visual 1024-d stream — whose single-pass working
set exceeds VMEM at any legal block (4 weight matrices alone are 8.4 MB
bf16) — uses a TWO-PASS backward (round 4): pass A (wo resident) runs
LN + output-dropout + out-projection backward and exports f32 dz/dctx;
pass B (wq/wk/wv resident) recomputes the attention and runs its VJP. The
f32 stitches make the split bit-identical to the single-pass kernel
(tested); the extra export traffic is ~3 HBM rows/layer ≈ microseconds.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_classification_tpu.ops.pallas_kernels.flash_attention import (
    hash_bits,
    keep_threshold,
)
from multimodal_classification_tpu.ops.pallas_kernels.fused_attn_block import (
    NEG_INF,
    _pad_items,
    _replicate,
)
from multimodal_classification_tpu.ops.pallas_kernels.fused_ffn_train import (
    _ln_stats,
)

_SUBLANE = 8
_LANE = 128
_VMEM_BUDGET = 13 * 2 ** 20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_layout_train(seq: int, hidden: int, itemsize: int):
    """One (s_p, bb, split) sized for the LARGER of the fwd/bwd working sets
    (the saved residual z must pad identically in both kernels). A SINGLE-PASS
    backward is preferred outright: the search returns the first layout
    (scanning smallest per-item padding, then largest block) whose one-pass
    backward fits, even if a split layout with less padding exists. Only when
    the single-pass backward doesn't fit at any legal block
    (the 1024-d visual stream: 4 weight matrices alone are 8.4 MB bf16) but
    the TWO-PASS backward does — pass A: LN + output-projection backward
    (wo resident), pass B: attention VJP + dx (wq/wk/wv resident), stitched
    by f32 dz/dctx exports whose traffic is negligible — return split=True.
    (0, 0, False) → unsupported."""
    weights = 4 * hidden * hidden * itemsize
    best_split = None
    for mult in (16, 32, 64, 128):
        s_p = _round_up(seq, mult)
        for bb in (16, 8, 4, 2, 1):
            r = bb * s_p
            if r % 128 or r > 512:
                continue
            fwd = (weights
                   + r * hidden * (8 * itemsize + 12)   # x/y dbl, qkv/ctx, z out
                   + 3 * r * r * 4)                     # scores/probs/bits
            bwd = (weights
                   + r * hidden * (14 * itemsize + 24)  # ins/outs + f32 temps
                   + 5 * r * r * 4)                     # per-head bwd tiles
            if fwd > _VMEM_BUDGET:
                continue
            if bwd <= _VMEM_BUDGET:
                return s_p, bb, False
            # Split layouts are OPT-IN (A/B knob): measured SLOWER at the
            # flagship config — 22.36/22.41 ms/step vs 21.53/21.49 text-only
            # in two same-run rep pairs (scripts/bench_train_fused.py,
            # VARIANTS=base,attn,attn_split). The visual layout degenerates
            # to one item per program (s_p=128: 28% pad rows, r=128 grid
            # ×16) and the two passes fetch the weight set twice; the saved
            # small-fusion overhead doesn't cover it. Kernels stay
            # parity-tested; default keeps the unfused visual path.
            if os.environ.get("MMC_ATTN_TRAIN_SPLIT") != "1":
                continue
            bwd_a = (hidden * hidden * itemsize          # wo
                     + r * hidden * (20 + 2 * itemsize))  # z/dy in, dz/dd/dctx out + temps
            bwd_b = (3 * hidden * hidden * itemsize      # wq/wk/wv
                     + r * hidden * (12 + 9 * itemsize)  # x/dz/dctx in, 5 outs, qkv temps
                     + 5 * r * r * 4)
            if max(bwd_a, bwd_b) <= _VMEM_BUDGET and best_split is None:
                best_split = (s_p, bb, True)
    return best_split if best_split is not None else (0, 0, False)


def supported_train(batch: int, seq: int, hidden: int, num_heads: int,
                    dtype) -> bool:
    if hidden % _LANE or hidden % num_heads:
        return False
    if (hidden // num_heads) % 64:
        return False
    return _pick_layout_train(seq, hidden, jnp.dtype(dtype).itemsize)[1] > 0


# --- coordinate helpers (layout independent; shared with the XLA twin) ------


def _attn_keep(s0, s1, item_row, head, qpos, kpos, thresh, num_heads):
    bh = item_row * jnp.uint32(num_heads) + jnp.uint32(head)
    return hash_bits(s0, s1, bh, qpos, kpos) >= jnp.uint32(thresh)


def _hidden_keep(s2, s3, item_row, qpos, cols, thresh):
    # bh = item, rows = position-in-item, cols = channel — independent of the
    # (s_p, bb) layout so the twin reproduces the stream on any backend
    bits = hash_bits(s2, s3, item_row, qpos, cols)
    return bits >= jnp.uint32(thresh)


# --- XLA twin ----------------------------------------------------------------


def block_train_reference(x3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                          gamma, beta, num_heads, rate_attn, rate_hidden,
                          seeds):
    """Exact-bit XLA twin ([B, S, H] in/out); the parity oracle and the
    off-TPU path. Mirrors the kernels' op/dtype sequence: bf16 dense outputs
    (f32 MXU accumulation), f32 scores/softmax, f32 residual + LayerNorm."""
    b, s, hd = x3.shape
    cdt = x3.dtype
    d = hd // num_heads

    def dense(x, w, bias):
        y = jax.lax.dot_general(
            x, w.astype(cdt), (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdt)
        return y + bias.astype(cdt)

    q = dense(x3, wq, bq).reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    k = dense(x3, wk, bk).reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    v = dense(x3, wv, bv).reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / (d ** 0.5)) + key_bias[:, None, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if rate_attn > 0.0:
        item = jnp.arange(b, dtype=jnp.uint32).reshape(b, 1, 1, 1)
        head = jnp.arange(num_heads, dtype=jnp.uint32).reshape(1, num_heads, 1, 1)
        qpos = jnp.arange(s, dtype=jnp.uint32).reshape(1, 1, s, 1)
        kpos = jnp.arange(s, dtype=jnp.uint32).reshape(1, 1, 1, s)
        keep = hash_bits(jnp.uint32(seeds[0]), jnp.uint32(seeds[1]),
                         item * jnp.uint32(num_heads) + head, qpos, kpos
                         ) >= jnp.uint32(keep_threshold(rate_attn))
        probs = jnp.where(keep, probs * (1.0 / (1.0 - rate_attn)), 0.0)
    probs = probs.astype(cdt)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(cdt)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, hd)
    a = dense(ctx, wo, bo).astype(jnp.float32)
    if rate_hidden > 0.0:
        item = jnp.arange(b, dtype=jnp.uint32).reshape(b, 1, 1)
        qpos = jnp.arange(s, dtype=jnp.uint32).reshape(1, s, 1)
        cols = jnp.arange(hd, dtype=jnp.uint32).reshape(1, 1, hd)
        keep = hash_bits(jnp.uint32(seeds[2]), jnp.uint32(seeds[3]),
                         item, qpos, cols
                         ) >= jnp.uint32(keep_threshold(rate_hidden))
        a = jnp.where(keep, a * (1.0 / (1.0 - rate_hidden)), 0.0)
    z = x3.astype(jnp.float32) + a
    zhat, _ = _ln_stats(z)
    y = (zhat * gamma.astype(jnp.float32)[None, None, :]
         + beta.astype(jnp.float32)[None, None, :])
    return y.astype(cdt)


# --- kernels -----------------------------------------------------------------


def _coords(n, bb, s_p, r):
    """(item_row [r,1], qpos [r,1]) uint32 for grid step n."""
    rowi = jax.lax.broadcasted_iota(jnp.uint32, (r, 1), 0)
    item = rowi // jnp.uint32(s_p) + jnp.uint32(n * bb)
    qpos = rowi % jnp.uint32(s_p)
    return item, qpos


def _train_fwd_kernel(refs, o_ref, z_ref, *, s_p, bb, num_heads,
                      ta, inv_a, th, inv_h):
    it = iter(refs)
    x_ref, bias_ref = next(it), next(it)
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it), next(it))
    g_ref, b_ref = next(it), next(it)
    seed_ref = next(it) if (ta is not None or th is not None) else None

    cdt = x_ref.dtype
    x = x_ref[:]
    r = x.shape[0]
    d = x.shape[1] // num_heads
    scale = 1.0 / (d ** 0.5)
    n = pl.program_id(0)

    def dense(xx, w_ref, b_ref_):
        y = jnp.dot(xx, w_ref[:], preferred_element_type=jnp.float32)
        return y.astype(cdt) + b_ref_[0:1, :].astype(cdt)

    q = dense(x, wq_ref, bq_ref)
    k = dense(x, wk_ref, bk_ref)
    v = dense(x, wv_ref, bv_ref)

    item_row = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0) // s_p
    item_col = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1) // s_p
    cross = jnp.where(item_row == item_col, 0.0, NEG_INF).astype(jnp.float32)
    add = cross + bias_ref[0:1, :].astype(jnp.float32)
    item_u, qpos_u = _coords(n, bb, s_p, r)
    kpos_row = jax.lax.broadcasted_iota(jnp.uint32, (1, r), 1) % jnp.uint32(s_p)

    ctx = []
    for h in range(num_heads):
        qh = q[:, h * d:(h + 1) * d]
        kh = k[:, h * d:(h + 1) * d]
        vh = v[:, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + add
        p = jax.nn.softmax(s, axis=-1)
        if ta is not None:
            keep = _attn_keep(seed_ref[0], seed_ref[1], item_u, h,
                              qpos_u, kpos_row, ta, num_heads)
            p = jnp.where(keep, p * inv_a, 0.0)
        ctx.append(
            jax.lax.dot_general(
                p.astype(cdt), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cdt)
        )
    ctx = jnp.concatenate(ctx, axis=1)
    a = dense(ctx, wo_ref, bo_ref).astype(jnp.float32)
    if th is not None:
        cols = jax.lax.broadcasted_iota(jnp.uint32, (r, x.shape[1]), 1)
        keep = _hidden_keep(seed_ref[2], seed_ref[3], item_u, qpos_u, cols, th)
        a = jnp.where(keep, a * inv_h, 0.0)
    z = x.astype(jnp.float32) + a
    zhat, _ = _ln_stats(z)
    o_ref[:] = (zhat * g_ref[0:1, :] + b_ref[0:1, :]).astype(cdt)
    z_ref[:] = z


def _train_bwd_kernel(refs, dx_ref, dq_ref, dk_ref, dv_ref, dd_ref, ctx_ref,
                      *, s_p, bb, num_heads, ta, inv_a, th, inv_h):
    it = iter(refs)
    x_ref, z_ref, dy_ref, bias_ref = next(it), next(it), next(it), next(it)
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it), next(it))
    g_ref = next(it)
    seed_ref = next(it) if (ta is not None or th is not None) else None

    cdt = x_ref.dtype
    x = x_ref[:]
    z = z_ref[:]
    dy = dy_ref[:].astype(jnp.float32)
    r = x.shape[0]
    hd = x.shape[1]
    d = hd // num_heads
    scale = 1.0 / (d ** 0.5)
    n = pl.program_id(0)

    def dense(xx, w_ref, b_ref_):
        y = jnp.dot(xx, w_ref[:], preferred_element_type=jnp.float32)
        return y.astype(cdt) + b_ref_[0:1, :].astype(cdt)

    # LN backward → dz; output dropout backward → dd
    zhat, rstd = _ln_stats(z)
    gg = dy * g_ref[0:1, :]
    dz = rstd * (
        gg
        - jnp.mean(gg, axis=-1, keepdims=True)
        - zhat * jnp.mean(gg * zhat, axis=-1, keepdims=True)
    )
    item_u, qpos_u = _coords(n, bb, s_p, r)
    if th is not None:
        cols = jax.lax.broadcasted_iota(jnp.uint32, (r, hd), 1)
        keep = _hidden_keep(seed_ref[2], seed_ref[3], item_u, qpos_u, cols, th)
        dd = jnp.where(keep, dz * inv_h, 0.0)
    else:
        dd = dz
    dd_c = dd.astype(cdt)
    dctx = jax.lax.dot_general(
        dd_c, wo_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # recompute q/k/v and the per-head attention, then the attention VJP
    q = dense(x, wq_ref, bq_ref)
    k = dense(x, wk_ref, bk_ref)
    v = dense(x, wv_ref, bv_ref)
    item_row = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0) // s_p
    item_col = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1) // s_p
    cross = jnp.where(item_row == item_col, 0.0, NEG_INF).astype(jnp.float32)
    add = cross + bias_ref[0:1, :].astype(jnp.float32)
    kpos_row = jax.lax.broadcasted_iota(jnp.uint32, (1, r), 1) % jnp.uint32(s_p)

    ctx_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
    for h in range(num_heads):
        qh = q[:, h * d:(h + 1) * d]
        kh = k[:, h * d:(h + 1) * d]
        vh = v[:, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + add
        p = jax.nn.softmax(s, axis=-1)
        if ta is not None:
            keep = _attn_keep(seed_ref[0], seed_ref[1], item_u, h,
                              qpos_u, kpos_row, ta, num_heads)
            pd = jnp.where(keep, p * inv_a, 0.0)
        else:
            pd = p
        pd_c = pd.astype(cdt)
        dctx_h = dctx[:, h * d:(h + 1) * d].astype(cdt)
        ctx_parts.append(
            jax.lax.dot_general(
                pd_c, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cdt)
        )
        dv_parts.append(
            jax.lax.dot_general(
                pd_c, dctx_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cdt)
        )
        dpd = jax.lax.dot_general(
            dctx_h, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if ta is not None:
            dp = jnp.where(keep, dpd * inv_a, 0.0)
        else:
            dp = dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_c = ds.astype(cdt)
        dq_parts.append(
            (jax.lax.dot_general(
                ds_c, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale).astype(cdt)
        )
        dk_parts.append(
            (jax.lax.dot_general(
                ds_c, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale).astype(cdt)
        )
    ctx = jnp.concatenate(ctx_parts, axis=1)
    dq = jnp.concatenate(dq_parts, axis=1)
    dk = jnp.concatenate(dk_parts, axis=1)
    dv = jnp.concatenate(dv_parts, axis=1)

    dx = dz
    for dgrad, w_ref in ((dq, wq_ref), (dk, wk_ref), (dv, wv_ref)):
        dx = dx + jax.lax.dot_general(
            dgrad, w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dx_ref[:] = dx.astype(cdt)
    dq_ref[:] = dq
    dk_ref[:] = dk
    dv_ref[:] = dv
    dd_ref[:] = dd_c
    ctx_ref[:] = ctx


def _train_bwd_ln_out_kernel(refs, dz_ref, dd_ref, dctx_ref, *, s_p, bb,
                             th, inv_h):
    """Split backward, pass A: LayerNorm + output-dropout + output-projection
    backward. Exports dz/dctx in f32 — bit-identical to the single-pass
    kernel's internal values (which also carries them in f32)."""
    it = iter(refs)
    z_ref, dy_ref = next(it), next(it)
    wo_ref, g_ref = next(it), next(it)
    seed_ref = next(it) if th is not None else None

    cdt = dy_ref.dtype
    z = z_ref[:]
    dy = dy_ref[:].astype(jnp.float32)
    r = z.shape[0]
    hd = z.shape[1]
    n = pl.program_id(0)

    zhat, rstd = _ln_stats(z)
    gg = dy * g_ref[0:1, :]
    dz = rstd * (
        gg
        - jnp.mean(gg, axis=-1, keepdims=True)
        - zhat * jnp.mean(gg * zhat, axis=-1, keepdims=True)
    )
    if th is not None:
        item_u, qpos_u = _coords(n, bb, s_p, r)
        cols = jax.lax.broadcasted_iota(jnp.uint32, (r, hd), 1)
        keep = _hidden_keep(seed_ref[2], seed_ref[3], item_u, qpos_u, cols, th)
        dd = jnp.where(keep, dz * inv_h, 0.0)
    else:
        dd = dz
    dd_c = dd.astype(cdt)
    dctx = jax.lax.dot_general(
        dd_c, wo_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dz_ref[:] = dz
    dd_ref[:] = dd_c
    dctx_ref[:] = dctx


def _train_bwd_attn_kernel(refs, dx_ref, dq_ref, dk_ref, dv_ref, ctx_ref,
                           *, s_p, bb, num_heads, ta, inv_a):
    """Split backward, pass B: recompute q/k/v + the per-head attention VJP
    from the pass-A dctx, and combine dx = dz + dq Wqᵀ + dk Wkᵀ + dv Wvᵀ.
    Same op/dtype sequence as the single-pass kernel."""
    it = iter(refs)
    x_ref, dz_ref, dctx_ref, bias_ref = next(it), next(it), next(it), next(it)
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it))
    seed_ref = next(it) if ta is not None else None

    cdt = x_ref.dtype
    x = x_ref[:]
    dctx = dctx_ref[:]
    r = x.shape[0]
    hd = x.shape[1]
    d = hd // num_heads
    scale = 1.0 / (d ** 0.5)
    n = pl.program_id(0)

    def dense(xx, w_ref, b_ref_):
        y = jnp.dot(xx, w_ref[:], preferred_element_type=jnp.float32)
        return y.astype(cdt) + b_ref_[0:1, :].astype(cdt)

    q = dense(x, wq_ref, bq_ref)
    k = dense(x, wk_ref, bk_ref)
    v = dense(x, wv_ref, bv_ref)
    item_row = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0) // s_p
    item_col = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1) // s_p
    cross = jnp.where(item_row == item_col, 0.0, NEG_INF).astype(jnp.float32)
    add = cross + bias_ref[0:1, :].astype(jnp.float32)
    if ta is not None:
        item_u, qpos_u = _coords(n, bb, s_p, r)
        kpos_row = (jax.lax.broadcasted_iota(jnp.uint32, (1, r), 1)
                    % jnp.uint32(s_p))

    ctx_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
    for h in range(num_heads):
        qh = q[:, h * d:(h + 1) * d]
        kh = k[:, h * d:(h + 1) * d]
        vh = v[:, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + add
        p = jax.nn.softmax(s, axis=-1)
        if ta is not None:
            keep = _attn_keep(seed_ref[0], seed_ref[1], item_u, h,
                              qpos_u, kpos_row, ta, num_heads)
            pd = jnp.where(keep, p * inv_a, 0.0)
        else:
            pd = p
        pd_c = pd.astype(cdt)
        dctx_h = dctx[:, h * d:(h + 1) * d].astype(cdt)
        ctx_parts.append(
            jax.lax.dot_general(
                pd_c, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cdt)
        )
        dv_parts.append(
            jax.lax.dot_general(
                pd_c, dctx_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cdt)
        )
        dpd = jax.lax.dot_general(
            dctx_h, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if ta is not None:
            dp = jnp.where(keep, dpd * inv_a, 0.0)
        else:
            dp = dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_c = ds.astype(cdt)
        dq_parts.append(
            (jax.lax.dot_general(
                ds_c, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale).astype(cdt)
        )
        dk_parts.append(
            (jax.lax.dot_general(
                ds_c, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale).astype(cdt)
        )
    ctx = jnp.concatenate(ctx_parts, axis=1)
    dq = jnp.concatenate(dq_parts, axis=1)
    dk = jnp.concatenate(dk_parts, axis=1)
    dv = jnp.concatenate(dv_parts, axis=1)

    dx = dz_ref[:]
    for dgrad, w_ref in ((dq, wq_ref), (dk, wk_ref), (dv, wv_ref)):
        dx = dx + jax.lax.dot_general(
            dgrad, w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dx_ref[:] = dx.astype(cdt)
    dq_ref[:] = dq
    dk_ref[:] = dk
    dv_ref[:] = dv
    ctx_ref[:] = ctx


# --- drivers -----------------------------------------------------------------


def _const_spec(a):
    return pl.BlockSpec(a.shape, lambda n: (0,) * a.ndim, memory_space=pltpu.VMEM)


def _thresholds(rate_attn, rate_hidden):
    ta = keep_threshold(rate_attn) if rate_attn > 0.0 else None
    th = keep_threshold(rate_hidden) if rate_hidden > 0.0 else None
    inv_a = 1.0 / (1.0 - rate_attn) if rate_attn > 0.0 else 1.0
    inv_h = 1.0 / (1.0 - rate_hidden) if rate_hidden > 0.0 else 1.0
    return ta, inv_a, th, inv_h


def _run_fwd(num_heads, s_p, bb, rate_attn, rate_hidden,
             x2, bias_rep, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta, seeds):
    rows, hd = x2.shape
    cdt = x2.dtype
    r = bb * s_p
    ta, inv_a, th, inv_h = _thresholds(rate_attn, rate_hidden)
    operands = [
        x2, bias_rep,
        wq.astype(cdt), _replicate(bq), wk.astype(cdt), _replicate(bk),
        wv.astype(cdt), _replicate(bv), wo.astype(cdt), _replicate(bo),
        _replicate(gamma), _replicate(beta),
    ]
    in_specs = [
        pl.BlockSpec((r, hd), lambda n: (n, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_SUBLANE, r), lambda n: (0, n), memory_space=pltpu.VMEM),
    ] + [_const_spec(a) for a in operands[2:]]
    if ta is not None or th is not None:
        operands.append(seeds)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    row = pl.BlockSpec((r, hd), lambda n: (n, 0), memory_space=pltpu.VMEM)
    y, z = pl.pallas_call(
        functools.partial(
            lambda *a, **kw: _train_fwd_kernel(a[:-2], a[-2], a[-1], **kw),
            s_p=s_p, bb=bb, num_heads=num_heads,
            ta=ta, inv_a=inv_a, th=th, inv_h=inv_h,
        ),
        grid=(rows // r,),
        in_specs=in_specs,
        out_specs=(row, pl.BlockSpec((r, hd), lambda n: (n, 0),
                                     memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((rows, hd), cdt),
            jax.ShapeDtypeStruct((rows, hd), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * hd * hd + 4 * rows * r * hd,
            bytes_accessed=(2 * rows * hd + 4 * hd * hd)
            * jnp.dtype(cdt).itemsize + rows * hd * 4,
            transcendentals=rows * r,
        ),
    )(*operands)
    return y, z


def _run_bwd(num_heads, s_p, bb, rate_attn, rate_hidden,
             x2, z, dy, bias_rep, wq, bq, wk, bk, wv, bv, wo, gamma, seeds):
    rows, hd = x2.shape
    cdt = x2.dtype
    r = bb * s_p
    ta, inv_a, th, inv_h = _thresholds(rate_attn, rate_hidden)
    operands = [
        x2, z, dy, bias_rep,
        wq.astype(cdt), _replicate(bq), wk.astype(cdt), _replicate(bk),
        wv.astype(cdt), _replicate(bv), wo.astype(cdt),
        _replicate(gamma),
    ]
    row = pl.BlockSpec((r, hd), lambda n: (n, 0), memory_space=pltpu.VMEM)
    in_specs = [
        row, pl.BlockSpec((r, hd), lambda n: (n, 0), memory_space=pltpu.VMEM),
        row,
        pl.BlockSpec((_SUBLANE, r), lambda n: (0, n), memory_space=pltpu.VMEM),
    ] + [_const_spec(a) for a in operands[4:]]
    if ta is not None or th is not None:
        operands.append(seeds)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    outs = pl.pallas_call(
        functools.partial(
            lambda *a, **kw: _train_bwd_kernel(
                a[:-6], a[-6], a[-5], a[-4], a[-3], a[-2], a[-1], **kw),
            s_p=s_p, bb=bb, num_heads=num_heads,
            ta=ta, inv_a=inv_a, th=th, inv_h=inv_h,
        ),
        grid=(rows // r,),
        in_specs=in_specs,
        out_specs=(row,) * 6,
        out_shape=tuple(jax.ShapeDtypeStruct((rows, hd), cdt) for _ in range(6)),
        cost_estimate=pl.CostEstimate(
            flops=24 * rows * hd * hd + 16 * rows * r * hd,
            bytes_accessed=(8 * rows * hd + 4 * hd * hd)
            * jnp.dtype(cdt).itemsize + rows * hd * 4,
            transcendentals=rows * r,
        ),
    )(*operands)
    return outs  # dx, dq, dk, dv, dd, ctx


def _run_bwd_split(num_heads, s_p, bb, rate_attn, rate_hidden,
                   x2, z, dy, bias_rep, wq, bq, wk, bk, wv, bv, wo, gamma,
                   seeds):
    """Two-pass backward for shapes whose single-pass working set exceeds
    VMEM (the 1024-d visual stream). Pass A (wo resident) → dz/dd/dctx;
    pass B (wq/wk/wv resident) → attention VJP + dx. The f32 dz/dctx
    exports make the passes bit-identical to the single-pass kernel."""
    rows, hd = x2.shape
    cdt = x2.dtype
    r = bb * s_p
    ta, inv_a, th, inv_h = _thresholds(rate_attn, rate_hidden)
    row = pl.BlockSpec((r, hd), lambda n: (n, 0), memory_space=pltpu.VMEM)
    row_f32 = pl.BlockSpec((r, hd), lambda n: (n, 0), memory_space=pltpu.VMEM)

    ops_a = [z, dy, wo.astype(cdt), _replicate(gamma)]
    specs_a = [row_f32, row, _const_spec(ops_a[2]), _const_spec(ops_a[3])]
    if th is not None:
        ops_a.append(seeds)
        specs_a.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    dz, dd, dctx = pl.pallas_call(
        functools.partial(
            lambda *a, **kw: _train_bwd_ln_out_kernel(
                a[:-3], a[-3], a[-2], a[-1], **kw),
            s_p=s_p, bb=bb, th=th, inv_h=inv_h,
        ),
        grid=(rows // r,),
        in_specs=specs_a,
        out_specs=(row_f32, row, row_f32),
        out_shape=(
            jax.ShapeDtypeStruct((rows, hd), jnp.float32),
            jax.ShapeDtypeStruct((rows, hd), cdt),
            jax.ShapeDtypeStruct((rows, hd), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * hd * hd,
            bytes_accessed=rows * hd * (12 + 3 * jnp.dtype(cdt).itemsize)
            + hd * hd * jnp.dtype(cdt).itemsize,
            transcendentals=0,
        ),
    )(*ops_a)

    ops_b = [
        x2, dz, dctx, bias_rep,
        wq.astype(cdt), _replicate(bq), wk.astype(cdt), _replicate(bk),
        wv.astype(cdt), _replicate(bv),
    ]
    specs_b = [
        row, row_f32, row_f32,
        pl.BlockSpec((_SUBLANE, r), lambda n: (0, n), memory_space=pltpu.VMEM),
    ] + [_const_spec(a) for a in ops_b[4:]]
    if ta is not None:
        ops_b.append(seeds)
        specs_b.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    dx, dq, dk, dv, ctx = pl.pallas_call(
        functools.partial(
            lambda *a, **kw: _train_bwd_attn_kernel(
                a[:-5], a[-5], a[-4], a[-3], a[-2], a[-1], **kw),
            s_p=s_p, bb=bb, num_heads=num_heads, ta=ta, inv_a=inv_a,
        ),
        grid=(rows // r,),
        in_specs=specs_b,
        out_specs=(row,) * 5,
        out_shape=tuple(jax.ShapeDtypeStruct((rows, hd), cdt) for _ in range(5)),
        cost_estimate=pl.CostEstimate(
            flops=18 * rows * hd * hd + 16 * rows * r * hd,
            bytes_accessed=rows * hd * (16 + 8 * jnp.dtype(cdt).itemsize)
            + 3 * hd * hd * jnp.dtype(cdt).itemsize,
            transcendentals=rows * r,
        ),
    )(*ops_b)
    return dx, dq, dk, dv, dd, ctx


# --- custom_vjp entry ---------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _block(num_heads, s_p, bb, split, rate_attn, rate_hidden,
           x2, bias_rep, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta, seeds):
    y, _ = _run_fwd(num_heads, s_p, bb, rate_attn, rate_hidden,
                    x2, bias_rep, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta,
                    seeds)
    return y


def _block_fwd(num_heads, s_p, bb, split, rate_attn, rate_hidden,
               x2, bias_rep, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta,
               seeds):
    y, z = _run_fwd(num_heads, s_p, bb, rate_attn, rate_hidden,
                    x2, bias_rep, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta,
                    seeds)
    return y, (x2, bias_rep, wq, bq, wk, bk, wv, bv, wo, gamma, seeds, z)


def _block_bwd(num_heads, s_p, bb, split, rate_attn, rate_hidden, res, g):
    x2, bias_rep, wq, bq, wk, bk, wv, bv, wo, gamma, seeds, z = res
    run = _run_bwd_split if split else _run_bwd
    dx, dq, dk, dv, dd, ctx = run(
        num_heads, s_p, bb, rate_attn, rate_hidden,
        x2, z, g, bias_rep, wq, bq, wk, bk, wv, bv, wo, gamma, seeds,
    )
    f32 = jnp.float32

    def wgrad(lhs, rhs):
        return jax.lax.dot_general(
            lhs, rhs, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )

    dwq, dwk, dwv = wgrad(x2, dq), wgrad(x2, dk), wgrad(x2, dv)
    dwo = wgrad(ctx, dd)
    dbq = jnp.sum(dq.astype(f32), axis=0)
    dbk = jnp.sum(dk.astype(f32), axis=0)
    dbv = jnp.sum(dv.astype(f32), axis=0)
    dbo = jnp.sum(dd.astype(f32), axis=0)
    gf = g.astype(f32)
    zhat, _ = _ln_stats(z)
    dgamma = jnp.sum(gf * zhat, axis=0)
    dbeta = jnp.sum(gf, axis=0)
    return (dx, None, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo,
            dgamma, dbeta, None)


_block.defvjp(_block_fwd, _block_bwd)


def fused_attn_block_train(x3, key_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                           gamma, beta, num_heads: int,
                           rate_attn: float, rate_hidden: float,
                           dropout_rng=None):
    """Training post-LN self-attention block over ``x3 [B, S, H]`` with
    in-kernel dropouts and a fused Pallas backward.

    ``key_bias [B, S]`` additive f32 (0 real / −1e9 masked); weights
    ``[H, H]`` f32; LayerNorm ``gamma/beta [H]`` f32. Differentiable in x and
    all weight/bias/LN operands. Any nonzero dropout rate requires
    ``dropout_rng``.
    """
    if (rate_attn > 0.0 or rate_hidden > 0.0) and dropout_rng is None:
        raise ValueError("nonzero dropout rate requires dropout_rng")
    if dropout_rng is not None:
        seeds = jax.random.bits(dropout_rng, (4,), jnp.uint32)
    else:
        seeds = jnp.zeros((4,), jnp.uint32)
    b, s, hd = x3.shape
    s_p, bb, split = _pick_layout_train(s, hd, jnp.dtype(x3.dtype).itemsize)
    x3p, key_bias_p, b_p = _pad_items(x3, key_bias, bb, s_p)
    x2 = x3p.reshape(b_p * s_p, hd)
    bias_rep = jnp.broadcast_to(
        key_bias_p.reshape(1, b_p * s_p).astype(jnp.float32),
        (_SUBLANE, b_p * s_p),
    )
    y = _block(num_heads, s_p, bb, split, float(rate_attn),
               float(rate_hidden),
               x2, bias_rep, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta,
               seeds)
    return y.reshape(b_p, s_p, hd)[:b, :s]
