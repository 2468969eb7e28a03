"""Analytic matmul-FLOP accounting for ViLBERT train/eval steps.

MFU convention: count the 2·M·N·K FLOPs of every dense/attention matmul in
the forward pass (the MXU-relevant work; elementwise/softmax/LayerNorm are
VPU-bound and excluded, per standard MFU accounting), take the backward as
2× forward (dgrad + wgrad per matmul), so one train step = 3× forward. The
optimizer update is elementwise (HBM-bound, ~0 matmul FLOPs).

Numbers are cross-checked against XLA's own
``jit(step).lower(...).compile().cost_analysis()['flops']`` in
tests/test_flops.py — XLA's count includes the elementwise tail, so the
analytic matmul count must sit slightly BELOW it and within tolerance.

v5e peaks used for MFU (docs/PERFORMANCE.md):
- nominal bf16: 197 TFLOP/s
- the chip's MEASURED lone-dot ceiling: 124 TFLOP/s (scripts/bench_int8_mxu.py
  — the best rate ANY plain bf16 matmul achieves here; 55-63% of nominal is
  this chip's empirical speed of light, reproduced by both XLA and Pallas).

Reference counterpart: none (the reference publishes no throughput or
efficiency numbers — SURVEY.md §6).
"""

from __future__ import annotations

from typing import Dict

V5E_BF16_PEAK_TFLOPS = 197.0
V5E_MEASURED_DOT_CEILING_TFLOPS = 124.0


def _dense(tokens: int, d_in: int, d_out: int) -> int:
    return 2 * tokens * d_in * d_out


def forward_matmul_flops(cfg, batch: int, seq: int, regions: int,
                         breakdown: Dict[str, int] = None) -> int:
    """Matmul FLOPs of one ViLBERT forward pass (models/vilbert.py).

    Walks the architecture config (works for the Facebook-exact flagship and
    any tiny/test variant): text self layers, visual self layers, the
    shared-K/V co-attention blocks at ``co_attention_text_layers``, visual
    embeddings, poolers and classifier head.
    """
    h = cfg.hidden_size
    f = cfg.intermediate_size
    hv = cfg.v_hidden_size
    fv = cfg.v_intermediate_size
    bi = cfg.bi_hidden_size
    B, s, r = batch, seq, regions
    out: Dict[str, int] = {}

    # visual embeddings: features v_feature_size→hv + spatial 5→hv per region
    out["v_embed"] = B * (_dense(r, cfg.v_feature_size, hv) + _dense(r, 5, hv))

    # text self-attention layers ×num_hidden_layers
    per_text = (
        _dense(s, h, h) * 4            # Q,K,V,out projections
        + 2 * 2 * s * s * h            # QK^T and probs·V
        + _dense(s, h, f) + _dense(s, f, h)
    )
    out["t_layers"] = B * cfg.num_hidden_layers * per_text

    # visual self-attention layers ×v_num_hidden_layers
    per_vis = (
        _dense(r, hv, hv) * 4
        + 2 * 2 * r * r * hv
        + _dense(r, hv, fv) + _dense(r, fv, hv)
    )
    out["v_layers"] = B * cfg.v_num_hidden_layers * per_vis

    # co-attention blocks ×len(co_attention_text_layers):
    # q1/k1/v1 (visual→bi), q2/k2/v2 (text→bi), two cross-attention
    # directions sharing K/V, per-stream out-projections + FFNs
    per_co = (
        3 * _dense(r, hv, bi) + 3 * _dense(s, h, bi)
        + 2 * (2 * r * s * bi) + 2 * (2 * s * r * bi)  # scores+AV per direction
        + _dense(r, bi, hv) + _dense(s, bi, h)
        + _dense(r, hv, fv) + _dense(r, fv, hv)
        + _dense(s, h, f) + _dense(s, f, h)
    )
    out["c_layers"] = B * len(cfg.co_attention_text_layers) * per_co

    # poolers (first token each) + classifier (concat 2·bi → hidden → 2)
    cls_hidden = getattr(cfg, "classifier_hidden_size", bi)
    out["head"] = B * (
        _dense(1, h, bi) + _dense(1, hv, bi)
        + _dense(1, 2 * bi, cls_hidden) + _dense(1, cls_hidden, cfg.num_labels)
    )

    if breakdown is not None:
        breakdown.update(out)
    return sum(out.values())


def train_step_matmul_flops(cfg, batch: int, seq: int, regions: int) -> int:
    """fwd + bwd (= 2× fwd: dgrad + wgrad per matmul); optimizer ≈ 0."""
    return 3 * forward_matmul_flops(cfg, batch, seq, regions)


def train_mfu(cfg, memes_per_sec: float, batch: int, seq: int,
              regions: int) -> Dict[str, float]:
    """MFU of a measured train throughput vs the nominal bf16 peak AND the
    chip's measured lone-dot ceiling (the honest denominator — no dot
    sequence of any shape exceeds it on this chip)."""
    per_meme = train_step_matmul_flops(cfg, batch, seq, regions) / batch
    tflops = per_meme * memes_per_sec / 1e12
    return {
        "train_gflop_per_meme": round(per_meme / 1e9, 2),
        "train_tflops": round(tflops, 2),
        "train_mfu_vs_nominal": round(tflops / V5E_BF16_PEAK_TFLOPS, 4),
        "train_mfu_vs_measured_ceiling": round(
            tflops / V5E_MEASURED_DOT_CEILING_TFLOPS, 4),
    }
