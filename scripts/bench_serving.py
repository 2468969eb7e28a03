#!/usr/bin/env python
"""Serving/inference benchmark: eval-path latency and throughput of the
flagship ViLBERT at the LMDB config, exercising the fused Pallas attention
kernel (dropout-off path). Prints JSON lines per batch size."""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from multimodal_classification_tpu.config import facebook_vilbert_config
    from multimodal_classification_tpu.models.vilbert import (
        ViLBERTForClassification,
        dummy_batch,
    )
    from multimodal_classification_tpu.ops.quant import (
        build_quant_tree,
        calibrate_quant_tree,
        count_quantized,
    )
    from multimodal_classification_tpu.training.train import (
        make_eval_step,
        make_quant_eval_step,
        model_inputs,
    )

    dev = jax.devices()[0]
    print(f"serving bench on {dev.platform}:{dev.device_kind}", file=sys.stderr)
    if os.environ.get("SERVING_MIXED"):
        return bench_mixed_buckets()
    if os.environ.get("SERVING_TINY"):  # CPU smoke of the harness itself
        from multimodal_classification_tpu.config import tiny_vilbert_config

        cfg = tiny_vilbert_config(dtype="float32", use_pallas_attention=False)
    else:
        cfg = facebook_vilbert_config()
    # "ffn" path: fused Pallas FFN kernel (config.fused_ffn, the default);
    # "bf16" is the explicitly UNFUSED XLA baseline so the same-run A/B
    # stays honest whatever the config default is. int8 paths quantize the
    # FFN denses, which refuse the fused kernel per-layer.
    import dataclasses as _dc

    if os.environ.get("SERVING_NO_PAD"):
        # A/B hook: disable the encoder-level visual-stream padding
        cfg = _dc.replace(cfg, visual_stream_padding=False)

    # baselines pin BOTH fusion flags off/on explicitly so the A/B stays
    # honest whatever the config defaults are
    model = ViLBERTForClassification(
        _dc.replace(cfg, fused_ffn=False, fused_attn_block=False))
    model_ffn = ViLBERTForClassification(
        _dc.replace(cfg, fused_ffn=True, fused_attn_block=False))
    # "blk"/"blk8": fused attention-BLOCK kernel on top of the fused FFN —
    # a text/visual transformer layer becomes two Pallas calls
    model_blk = ViLBERTForClassification(
        _dc.replace(cfg, fused_ffn=True, fused_attn_block=True,
                    fused_co_attn=False))
    # "coa"/"coa8": + fused co-attention directions — the whole encoder is
    # Pallas kernels end to end
    model_coa = ViLBERTForClassification(
        _dc.replace(cfg, fused_ffn=True, fused_attn_block=True,
                    fused_co_attn=True))
    # "lyr8": + whole-text-layer fusion on top of coa8 (one Pallas kernel
    # per int8 text layer — attention block + FFN + residual LN)
    model_lyr = ViLBERTForClassification(
        _dc.replace(cfg, fused_ffn=True, fused_attn_block=True,
                    fused_co_attn=True, fused_text_layer=True))
    # "lyr8nc": whole-text-layer fusion WITHOUT the co-attention fusion —
    # isolates the co-attn kernel's contribution at the current record
    # config (the auto-policy re-validation grid, VERDICT r3 #6)
    model_lyr_nc = ViLBERTForClassification(
        _dc.replace(cfg, fused_ffn=True, fused_attn_block=True,
                    fused_co_attn=False, fused_text_layer=True))
    from multimodal_classification_tpu.utils.xla_options import (
        compiler_options_from_env,
    )

    copts = compiler_options_from_env()
    eval_step = jax.jit(make_eval_step(model), compiler_options=copts)
    quant_step = jax.jit(make_quant_eval_step(model), compiler_options=copts)
    ffn_step = jax.jit(make_eval_step(model_ffn), compiler_options=copts)
    # "int8f": int8 quant + the fused int8 FFN kernel (int8 MXU dots with
    # VMEM-resident int8 weights) — the shipping default when serving_int8
    quant_ffn_step = jax.jit(make_quant_eval_step(model_ffn), compiler_options=copts)
    blk_step = jax.jit(make_eval_step(model_blk), compiler_options=copts)
    quant_blk_step = jax.jit(make_quant_eval_step(model_blk), compiler_options=copts)
    coa_step = jax.jit(make_eval_step(model_coa), compiler_options=copts)
    quant_coa_step = jax.jit(make_quant_eval_step(model_coa), compiler_options=copts)
    quant_lyr_step = jax.jit(make_quant_eval_step(model_lyr), compiler_options=copts)
    quant_lyr_nc_step = jax.jit(make_quant_eval_step(model_lyr_nc),
                                compiler_options=copts)

    batches = tuple(
        int(b) for b in os.environ.get("SERVING_BATCHES", "1,16,64").split(",")
    )
    # text length: 128 is the reference's padded cap; real meme texts are
    # 12-25 tokens, so deployments compile at a bucket (masked attention --
    # identical function on real tokens, exactness-tested for training)
    seq = int(os.environ.get("SERVING_SEQ", "128"))
    # paths: bf16 (float), int8 (dynamic per-row activation scales),
    # int8s (STATIC calibrated scales — no pre-matmul max-reduction)
    paths = os.environ.get("SERVING_PATHS", "bf16,int8,int8s").split(",")
    params = quant = quant_static = None
    for bs in batches:
        batch = dummy_batch(cfg, bs, seq, 100)
        rng = np.random.default_rng(0)
        batch["visual_features"] = jnp.asarray(
            rng.standard_normal(batch["visual_features"].shape), jnp.bfloat16
        )
        if params is None:
            params = model.init(jax.random.key(0), **batch)["params"]
            quant = build_quant_tree(params)
            print(f"int8-quantized kernels: {count_quantized(quant)}", file=sys.stderr)
            if "int8s" in paths:
                t0 = time.perf_counter()
                quant_static = calibrate_quant_tree(model, params, quant, [batch])
                print(f"calibrated static scales in {time.perf_counter() - t0:.1f}s",
                      file=sys.stderr)

        steps = {
            "bf16": lambda b: eval_step(params, model_inputs(b)),
            "ffn": lambda b: ffn_step(params, model_inputs(b)),
            "int8": lambda b: quant_step(params, quant, model_inputs(b)),
            "int8f": lambda b: quant_ffn_step(params, quant, model_inputs(b)),
            "int8s": lambda b: quant_step(params, quant_static, model_inputs(b)),
            "blk": lambda b: blk_step(params, model_inputs(b)),
            "blk8": lambda b: quant_blk_step(params, quant, model_inputs(b)),
            "coa": lambda b: coa_step(params, model_inputs(b)),
            "coa8": lambda b: quant_coa_step(params, quant, model_inputs(b)),
            "lyr8": lambda b: quant_lyr_step(params, quant, model_inputs(b)),
            "lyr8nc": lambda b: quant_lyr_nc_step(params, quant, model_inputs(b)),
        }
        for name, step in ((p, steps[p]) for p in paths):
            for _ in range(3):
                logits = step(batch)
            _ = float(logits[0, 0])
            n = 20
            t0 = time.perf_counter()
            for _ in range(n):
                logits = step(batch)
            _ = float(logits[0, 0])
            dt = time.perf_counter() - t0
            print(json.dumps({
                "path": name,
                "seq": seq,
                "batch_size": bs,
                "latency_ms": round(dt / n * 1000, 2),
                "memes_per_sec": round(n * bs / dt, 1),
            }))
    return 0


def bench_mixed_buckets() -> int:
    """Realistic mixed-length traffic through the FULL ServingModel path
    (native tokenizer + padding + dispatch): 90% short meme texts (12-25
    tokens), 8% medium (~50), 2% long (~120). Compares a single 128-token
    program against seq buckets (32, 64) with length-grouped batches (what
    the micro-batcher produces). SERVING_MIXED=1 to run."""
    import jax

    from multimodal_classification_tpu.config import facebook_vilbert_config
    from multimodal_classification_tpu.data import WordPieceTokenizer, build_test_vocab
    from multimodal_classification_tpu.models.vilbert import (
        ViLBERTForClassification,
        dummy_batch,
    )
    from multimodal_classification_tpu.serving import ServingModel
    from multimodal_classification_tpu.training.train import model_inputs

    bs = int(os.environ.get("MIXED_BATCH", "16"))
    n_req = int(os.environ.get("MIXED_REQUESTS", "512"))
    if os.environ.get("MIXED_TINY"):  # CPU smoke of the harness itself
        from multimodal_classification_tpu.config import tiny_vilbert_config

        cfg = tiny_vilbert_config(dtype="float32", use_pallas_attention=False)
    else:
        cfg = facebook_vilbert_config()
    model = ViLBERTForClassification(cfg)
    batch = dummy_batch(cfg, 1, 16, 100)
    params = model.init(jax.random.key(0), **model_inputs(batch))["params"]
    tok = WordPieceTokenizer(build_test_vocab())

    rng = np.random.default_rng(0)
    kinds = rng.choice([18, 50, 120], size=n_req, p=[0.90, 0.08, 0.02])
    texts = ["w " * (int(k) - 2) for k in kinds]

    for label, buckets in (("single_128", ()), ("buckets_32_64", (32, 64))):
        sm = ServingModel(model, params, tok, None, max_seq_length=128,
                          num_regions=100, feature_dim=cfg.v_feature_size,
                          batch_size=bs, seq_buckets=buckets)
        sm.warmup()
        # length-grouped batches, as _MicroBatcher dispatches them
        t0 = time.perf_counter()
        done = 0
        for start in range(0, n_req, bs):
            window = texts[start:start + bs]
            for idx in sm.group_by_bucket(window):
                probs = sm.predict([window[i] for i in idx])
                done += len(idx)
        _ = float(probs[0, 0])
        dt = time.perf_counter() - t0
        print(json.dumps({
            "path": label,
            "batch_size": bs,
            "requests": done,
            "memes_per_sec": round(done / dt, 1),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
