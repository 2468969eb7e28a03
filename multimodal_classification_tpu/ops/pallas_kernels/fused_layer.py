"""Fused whole-TRANSFORMER-LAYER Pallas TPU kernel (int8 eval path).

One kernel computes an entire post-LN BERT text layer —

    q/k/v projections → masked attention → out projection → LN1(x + out)
    → FFN dense1 → erf-GELU → FFN dense2 → LN2(h + ffn)

— with all SIX int8 weight matrices VMEM-resident (reference chain:
BertSelfAttention → BertSelfOutput → BertIntermediate → BertOutput,
vilbert_core.py:41-201 / vilbert_facebook_arch.py:110-221).

Why: the batch-112 record-config XPlane profile put the 12 text layers at
3.73 ms/step ≈ 50% of their int8 roofline while the visual FFN kernel ran
at ~100% — the text layers' two kernel calls each process only
``batch·32`` rows, so per-call dispatch/pipeline ramp dominates. Fusing the
layer halves the call count and keeps the attention output ``h`` in VMEM
(the two-kernel path round-trips it through HBM and re-quantizes it from
the HBM copy).

Int8-only by necessity: the six bf16 weight matrices of a 768/3072 layer
are 14.2 MB — over the VMEM budget — while int8 is 7.1 MB. The float path
keeps the existing two-kernel split (fused_attn_block + fused_ffn); this
kernel serves the shipping int8 record configuration.

Numerics are EXACTLY the two-kernel chain (parity-tested against composing
their XLA twins): the attention half mirrors ``fused_attn_block._kernel_int8``
(input block row-quantized once for q/k/v), ``h`` is rounded to the compute
dtype before the FFN re-quantizes it (the unfused path quantizes the
HBM-rounded tensor), the FFN half mirrors ``fused_ffn._kernel_int8``
(f32 bias/GELU chain, poly-erf — Mosaic lowers no erf), and the final
residual LayerNorm matches ``ResidualOutput`` (f32 over the cdt-rounded
FFN output + ``h``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_classification_tpu.ops.pallas_kernels.fused_attn_block import (  # noqa: E501
    _layernorm_f32,
    _masked_block_attention,
    _pad_items,
    _replicate,
    _round_up,
    _rowquant,
    _SUBLANE,
    _VMEM_BUDGET,
    block_int8_reference,
)
from multimodal_classification_tpu.ops.pallas_kernels.fused_ffn import (
    _erf,
    ffn_int8_reference,
)

_LANE = 128


def _pick_layout(seq: int, hidden: int, inter: int, itemsize: int):
    """(padded per-item rows s_p, items per program bb) for the whole-layer
    int8 kernel: six resident int8 matrices + the attention working set +
    the f32 FFN intermediate must fit VMEM. Returns (0, 0) if nothing fits.
    At the flagship text shape (seq 32, 768/3072) this lands on bb=4
    (r=128) — incidentally also halving the block-diagonal score waste of
    the attention-only kernel's bb=8."""
    weights = 4 * hidden * hidden + 2 * hidden * inter  # int8 bytes
    for mult in (16, 32, 64, 128):
        s_p = _round_up(seq, mult)
        for bb in (16, 8, 4, 2, 1):
            r = bb * s_p
            if r % _LANE or r > 1024:
                continue
            working = (
                weights
                + 4 * r * hidden * itemsize   # x in/out, double-buffered
                + 4 * r * hidden * itemsize   # q/k/v/ctx (compute dtype)
                + 2 * r * r * 4               # scores + probs (f32)
                + 2 * r * hidden * 4          # f32 h / LN temps
                + 2 * r * hidden              # quantized x and h blocks
                + r * inter * 4               # f32 FFN intermediate
                + r * inter                   # quantized intermediate
            )
            if working <= _VMEM_BUDGET:
                return s_p, bb
    return 0, 0


def supported_layer(batch: int, seq: int, hidden: int, inter: int,
                    num_heads: int, dtype) -> bool:
    """Static applicability: lane-aligned dims, 64-multiple head dim, and a
    layout that fits. The visual stream (1024/4096: 12.6 MB of int8 weights
    alone) is refused by the budget — this kernel serves text layers."""
    if hidden % _LANE or inter % _LANE or hidden % num_heads:
        return False
    if (hidden // num_heads) % 64:
        return False
    return _pick_layout(seq, hidden, inter, jnp.dtype(dtype).itemsize)[1] > 0


def _kernel_int8(x_ref, bias_ref,
                 qq_ref, sq_ref, bq_ref, qk_ref, sk_ref, bk_ref,
                 qv_ref, sv_ref, bv_ref, qo_ref, so_ref, bo_ref,
                 g1_ref, b1_ref,
                 q1_ref, s1_ref, bf1_ref, q2_ref, s2_ref, bf2_ref,
                 g2_ref, b2_ref, o_ref, *, seq, num_heads):
    cdt = x_ref.dtype

    def int8_dense(qin, ain, qw_ref, s_ref, b_ref_):
        acc = jax.lax.dot_general(
            qin, qw_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * ain * s_ref[0:1, :]).astype(cdt)
        return y + b_ref_[0:1, :].astype(cdt)

    # ---- attention sub-block (== fused_attn_block._kernel_int8) ----------
    x = x_ref[:]
    qx, ax = _rowquant(x.astype(jnp.float32))
    q = int8_dense(qx, ax, qq_ref, sq_ref, bq_ref)
    k = int8_dense(qx, ax, qk_ref, sk_ref, bk_ref)
    v = int8_dense(qx, ax, qv_ref, sv_ref, bv_ref)
    ctx = _masked_block_attention(q, k, v, bias_ref[0:1, :], seq, num_heads,
                                  cdt)
    qc, ac = _rowquant(ctx.astype(jnp.float32))
    a = int8_dense(qc, ac, qo_ref, so_ref, bo_ref)
    h_f32 = _layernorm_f32(
        a.astype(jnp.float32) + x.astype(jnp.float32),
        g1_ref[0:1, :], b1_ref[0:1, :],
    )
    # the two-kernel path rounds h to the compute dtype in HBM before the
    # FFN kernel re-quantizes it — round here for bit-identical numerics
    h = h_f32.astype(cdt)

    # ---- FFN sub-block (== fused_ffn._kernel_int8) ------------------------
    qh, ah = _rowquant(h.astype(jnp.float32))
    acc1 = jax.lax.dot_general(
        qh, q1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    u = acc1.astype(jnp.float32) * ah * s1_ref[0:1, :] + bf1_ref[0:1, :]
    g = 0.5 * u * (1.0 + _erf(u * 0.7071067811865476))
    qg, ag = _rowquant(g)
    acc2 = jax.lax.dot_general(
        qg, q2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = (acc2.astype(jnp.float32) * ag * s2_ref[0:1, :]
         + bf2_ref[0:1, :]).astype(cdt)

    # ---- residual LayerNorm (== ResidualOutput with precomputed=y) --------
    out = _layernorm_f32(
        y.astype(jnp.float32) + h.astype(jnp.float32),
        g2_ref[0:1, :], b2_ref[0:1, :],
    )
    o_ref[:] = out.astype(cdt)


def layer_int8_reference(x3, key_bias,
                         qq, sq, bq, qk, sk, bk, qv, sv, bv, qo, so, bo,
                         g1, b1, q1, s1, bf1, q2, s2, bf2, g2, b2,
                         num_heads: int):
    """XLA twin: EXACT composition of the two kernels' twins + the model's
    residual LayerNorm — the off-TPU path and the parity-test oracle."""
    h = block_int8_reference(x3, key_bias, qq, sq, bq, qk, sk, bk, qv, sv,
                             bv, qo, so, bo, g1, b1, num_heads)
    cdt = x3.dtype
    y = ffn_int8_reference(h.reshape(-1, h.shape[-1]), q1, s1, bf1, q2, s2,
                           bf2).reshape(h.shape)
    out = _layernorm_f32(
        y.astype(jnp.float32) + h.astype(jnp.float32),
        g2.astype(jnp.float32)[None, None, :],
        b2.astype(jnp.float32)[None, None, :],
    )
    return out.astype(cdt)


def fused_layer_int8(x3, key_bias,
                     qq, sq, bq, qk, sk, bk, qv, sv, bv, qo, so, bo,
                     g1, b1, q1, s1, bf1, q2, s2, bf2, g2, b2,
                     num_heads: int):
    """Whole int8 post-LN transformer layer over ``x3 [B, S, H]`` in one
    Pallas call (inference-only — the serving int8 path is never
    differentiated). ``q*: int8 weights``, ``s*: f32 per-output-channel
    scales``, biases/LN params f32; ``key_bias [B, S]`` additive f32."""
    b, s, hd = x3.shape
    inter = q1.shape[1]
    cdt = x3.dtype
    s_p, bb = _pick_layout(s, hd, inter, jnp.dtype(cdt).itemsize)
    x3, key_bias, b_p = _pad_items(x3, key_bias, bb, s_p)
    r = bb * s_p
    x2 = x3.reshape(b_p * s_p, hd)
    bias_rep = jnp.broadcast_to(
        key_bias.reshape(1, b_p * s_p).astype(jnp.float32),
        (_SUBLANE, b_p * s_p))
    operands = [
        x2, bias_rep,
        qq, _replicate(sq), _replicate(bq),
        qk, _replicate(sk), _replicate(bk),
        qv, _replicate(sv), _replicate(bv),
        qo, _replicate(so), _replicate(bo),
        _replicate(g1), _replicate(b1),
        q1, _replicate(s1), _replicate(bf1),
        q2, _replicate(s2), _replicate(bf2),
        _replicate(g2), _replicate(b2),
    ]
    const = lambda a: pl.BlockSpec(  # noqa: E731 — whole array, fetched once
        a.shape, lambda n: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    n_rows = b_p * s_p
    out = pl.pallas_call(
        functools.partial(_kernel_int8, seq=s_p, num_heads=num_heads),
        grid=(n_rows // r,),
        in_specs=[
            pl.BlockSpec((r, hd), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, r), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
        ] + [const(a) for a in operands[2:]],
        out_specs=pl.BlockSpec((r, hd), lambda n: (n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, hd), cdt),
        cost_estimate=pl.CostEstimate(
            # 4 H×H projections + 2 H×I FFN dots over all rows, plus the
            # block-diagonal score/context dots
            flops=8 * n_rows * hd * hd + 4 * n_rows * hd * inter
            + 4 * n_rows * r * hd,
            bytes_accessed=2 * n_rows * hd * jnp.dtype(cdt).itemsize
            + 4 * hd * hd + 2 * hd * inter,
            transcendentals=n_rows * (r + inter),
        ),
    )(*operands)
    return out.reshape(b_p, s_p, hd)[:b, :s]
