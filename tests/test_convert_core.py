"""Core-variant (vilbert_hf) converter test: a state dict fabricated with the
reference's exact key layout (models/vilbert_core.py attribute names, with
the HF-hub ``vilbert.`` wrapper prefix) fully merges into our core model."""

import jax
import numpy as np
import pytest
import torch

from multimodal_classification_tpu.config import core_vilbert_config
from multimodal_classification_tpu.models.convert import (
    convert_core_vilbert,
    merge_params,
)
from multimodal_classification_tpu.models.vilbert import (
    ViLBERTForClassification,
    dummy_batch,
)


def _lin(sd, key, din, dout):
    sd[f"{key}.weight"] = torch.randn(dout, din)
    sd[f"{key}.bias"] = torch.randn(dout)


def _ln(sd, key, d):
    sd[f"{key}.weight"] = torch.randn(d)
    sd[f"{key}.bias"] = torch.randn(d)


def _bert_layer(sd, pre, h, inter):
    for qkv in ("query", "key", "value"):
        _lin(sd, f"{pre}.attention.self.{qkv}", h, h)
    _lin(sd, f"{pre}.attention.output.dense", h, h)
    _ln(sd, f"{pre}.attention.output.LayerNorm", h)
    _lin(sd, f"{pre}.intermediate.dense", h, inter)
    _lin(sd, f"{pre}.output.dense", inter, h)
    _ln(sd, f"{pre}.output.LayerNorm", h)


def test_core_converter_full_merge():
    h, inter, vocab = 32, 64, 128
    cfg = core_vilbert_config(
        hidden_size=h, num_attention_heads=2, num_hidden_layers=2,
        intermediate_size=inter, vocab_size=vocab, max_position_embeddings=64,
        v_hidden_size=h, v_num_attention_heads=2, v_num_hidden_layers=1,
        v_intermediate_size=inter, bi_hidden_size=h, bi_num_attention_heads=2,
        co_attention_text_layers=(1,), v_feature_size=48,
        classifier_hidden_size=h, dtype="float32", use_pallas_attention=False,
    )
    sd = {}
    # text embeddings (HF BertModel layout under vilbert.bert.)
    sd["vilbert.bert.embeddings.word_embeddings.weight"] = torch.randn(vocab, h)
    sd["vilbert.bert.embeddings.position_embeddings.weight"] = torch.randn(64, h)
    sd["vilbert.bert.embeddings.token_type_embeddings.weight"] = torch.randn(2, h)
    _ln(sd, "vilbert.bert.embeddings.LayerNorm", h)
    # visual embeddings (vilbert_core naming: location_embeddings)
    _lin(sd, "vilbert.visual_embeddings.image_embeddings", 48, h)
    _lin(sd, "vilbert.visual_embeddings.location_embeddings", 5, h)
    sd["vilbert.visual_embeddings.position_embeddings.weight"] = torch.randn(100, h)
    _ln(sd, "vilbert.visual_embeddings.LayerNorm", h)
    # encoder
    for i in range(2):
        _bert_layer(sd, f"vilbert.encoder.t_layer.{i}", h, inter)
    _bert_layer(sd, "vilbert.encoder.v_layer.0", h, inter)
    base = "vilbert.encoder.c_layer.0"
    for stream in ("biattention_v", "biattention_t"):
        for qkv in ("query", "key", "value"):
            _lin(sd, f"{base}.{stream}.self.{qkv}", h, h)
        _lin(sd, f"{base}.{stream}.output.dense", h, h)
        _ln(sd, f"{base}.{stream}.output.LayerNorm", h)
    for s in ("v", "t"):
        _lin(sd, f"{base}.intermediate_{s}.dense", h, inter)
        _lin(sd, f"{base}.output_{s}.dense", inter, h)
        _ln(sd, f"{base}.output_{s}.LayerNorm", h)
    # poolers + head
    _lin(sd, "vilbert.t_pooler.0", h, h)
    _lin(sd, "vilbert.v_pooler.0", h, h)
    _lin(sd, "classifier.1", 2 * h, h)
    _lin(sd, "classifier.4", h, 2)
    # noise the converter must skip
    sd["cls.predictions.bias"] = torch.zeros(7)

    model = ViLBERTForClassification(cfg)
    batch = dummy_batch(cfg, 1, 8, 4)
    init = model.init(jax.random.key(0), **batch)["params"]
    loaded = convert_core_vilbert(sd, cfg)
    params, n, total = merge_params(init, loaded)
    assert n == total, f"{n}/{total} merged"
    out = model.apply({"params": params}, **batch)
    assert np.all(np.isfinite(np.asarray(out["logits"])))


def test_fabricated_facebook_state_dict_full_merge():
    """fabricate_facebook_state_dict emits the exact upstream key layout:
    every model leaf merges (used by scripts/reproduce_lmdb_auroc.py
    --dry-run to exercise the converter offline)."""
    from multimodal_classification_tpu.config import facebook_vilbert_config
    from multimodal_classification_tpu.models.convert import (
        convert_facebook_vilbert,
        fabricate_facebook_state_dict,
    )

    kw = dict(hidden_size=32, num_attention_heads=2, num_hidden_layers=2,
              intermediate_size=64, vocab_size=128, v_hidden_size=32,
              v_num_attention_heads=2, v_num_hidden_layers=1,
              v_intermediate_size=32, bi_hidden_size=32,
              bi_num_attention_heads=2, co_attention_text_layers=[1],
              v_feature_size=128, classifier_hidden_size=32, dtype="float32",
              use_pallas_attention=False)
    cfg = facebook_vilbert_config(**kw)
    sd = fabricate_facebook_state_dict({**kw, "not_a_config_key": 1})
    loaded = convert_facebook_vilbert(sd, cfg)
    model = ViLBERTForClassification(cfg)
    init = model.init(jax.random.key(0), **dummy_batch(cfg, 1, 8, 4))["params"]
    merged, n, total = merge_params(init, loaded)
    assert n == total and total > 50


def test_core_converter_handles_all_wrapper_prefixes():
    """The HF-hub checkpoint (visualjoyce/transformers4vl-vilbert) may carry
    module./model./vilbert. wrappers (reference vilbert_hf.py:183-198
    candidate-key loop) — all normalise to the same bare layout."""
    import numpy as np

    from multimodal_classification_tpu.models.convert import normalize_core_keys

    base = {"bert.embeddings.word_embeddings.weight": np.ones((4, 2))}
    for prefix in ("module.", "model.", "vilbert.", "module.vilbert."):
        wrapped = {prefix + k: v for k, v in base.items()}
        got = normalize_core_keys(wrapped)
        assert set(got) == set(base), prefix
