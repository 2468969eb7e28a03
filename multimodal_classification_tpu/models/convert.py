"""Checkpoint conversion: PyTorch ViLBERT state dicts → Flax param pytrees.

Replaces the reference's fuzzy key-remapping loaders
(reference: vilbert_facebook_arch.py:644-683 load_facebook_weights,
vilbert_hf.py:166-201, vilbert_facebook.py:160-211) with an explicit,
shape-checked mapping. Handles the Facebook-exact asymmetric layout
(bert.encoder.{layer,v_layer,c_layer}.* with biattention/biOutput naming,
documented at vilbert_facebook_arch.py:7-21) and Facebook's original
pretraining checkpoints (``bert.*`` weights, ``cls.*`` heads skipped).

Conventions: torch Linear weight [out,in] → flax kernel [in,out] (transpose);
LayerNorm weight → scale; Embedding weight → embedding.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

from multimodal_classification_tpu.config import ViLBERTConfig


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (cpu) without importing torch at module scope
    return t.detach().cpu().numpy()


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _linear(tree, prefix: Tuple[str, ...], sd, key: str):
    _set(tree, prefix + ("kernel",), _np(sd[key + ".weight"]).T)
    _set(tree, prefix + ("bias",), _np(sd[key + ".bias"]))


def _layernorm(tree, prefix: Tuple[str, ...], sd, key: str):
    _set(tree, prefix + ("scale",), _np(sd[key + ".weight"]))
    _set(tree, prefix + ("bias",), _np(sd[key + ".bias"]))


def _embed(tree, prefix: Tuple[str, ...], sd, key: str):
    _set(tree, prefix + ("embedding",), _np(sd[key + ".weight"]))


def _bert_layer(tree, flax_prefix: Tuple[str, ...], sd, torch_prefix: str):
    for qkv in ("query", "key", "value"):
        _linear(tree, flax_prefix + ("attention", qkv), sd, f"{torch_prefix}.attention.self.{qkv}")
    _linear(tree, flax_prefix + ("attention_output", "dense"), sd, f"{torch_prefix}.attention.output.dense")
    _layernorm(tree, flax_prefix + ("attention_output", "LayerNorm"), sd, f"{torch_prefix}.attention.output.LayerNorm")
    _linear(tree, flax_prefix + ("intermediate", "dense"), sd, f"{torch_prefix}.intermediate.dense")
    _linear(tree, flax_prefix + ("output", "dense"), sd, f"{torch_prefix}.output.dense")
    _layernorm(tree, flax_prefix + ("output", "LayerNorm"), sd, f"{torch_prefix}.output.LayerNorm")


def convert_facebook_vilbert(
    state_dict: Mapping[str, Any],
    cfg: ViLBERTConfig,
    strict_head: bool = False,
) -> Dict[str, Any]:
    """Convert a Facebook-arch ViLBERT torch state dict to flax params.

    Accepts both the reference's fine-tuned classifier checkpoints
    (with ``classifier.1``/``classifier.4``) and Facebook's pretraining
    checkpoints (no classifier; ``cls.*`` heads are skipped). Missing head
    params are left absent — merge over freshly-initialised params with
    :func:`merge_params`.
    """
    sd = {k: v for k, v in state_dict.items() if not k.startswith("cls.")}
    p: Dict[str, Any] = {}

    # Embeddings
    for name in ("word_embeddings", "position_embeddings", "token_type_embeddings"):
        _embed(p, ("bert", "embeddings", name), sd, f"bert.embeddings.{name}")
    _layernorm(p, ("bert", "embeddings", "LayerNorm"), sd, "bert.embeddings.LayerNorm")

    _linear(p, ("bert", "v_embeddings", "image_embeddings"), sd, "bert.v_embeddings.image_embeddings")
    _linear(
        p, ("bert", "v_embeddings", "image_location_embeddings"), sd,
        "bert.v_embeddings.image_location_embeddings",
    )
    _layernorm(p, ("bert", "v_embeddings", "LayerNorm"), sd, "bert.v_embeddings.LayerNorm")

    # Encoder streams
    for i in range(cfg.num_hidden_layers):
        _bert_layer(p, ("bert", "encoder", f"layer_{i}"), sd, f"bert.encoder.layer.{i}")
    for i in range(cfg.v_num_hidden_layers):
        _bert_layer(p, ("bert", "encoder", f"v_layer_{i}"), sd, f"bert.encoder.v_layer.{i}")

    # Co-attention layers (shared bi-space projections; biOutput.q_dense1/
    # q_dense2 exist in checkpoints but are dead params — never applied in the
    # reference forward (vilbert_facebook_arch.py:324-338) — so skipped)
    for i in range(len(cfg.co_attention_text_layers)):
        base = f"bert.encoder.c_layer.{i}"
        cl = ("bert", "encoder", f"c_layer_{i}")
        for proj in ("query1", "key1", "value1", "query2", "key2", "value2"):
            _linear(p, cl + (proj,), sd, f"{base}.biattention.{proj}")
        _linear(p, cl + ("v_output_attn", "dense"), sd, f"{base}.biOutput.dense1")
        _layernorm(p, cl + ("v_output_attn", "LayerNorm"), sd, f"{base}.biOutput.LayerNorm1")
        _linear(p, cl + ("t_output_attn", "dense"), sd, f"{base}.biOutput.dense2")
        _layernorm(p, cl + ("t_output_attn", "LayerNorm"), sd, f"{base}.biOutput.LayerNorm2")
        _linear(p, cl + ("v_intermediate", "dense"), sd, f"{base}.v_intermediate.dense")
        _linear(p, cl + ("v_output", "dense"), sd, f"{base}.v_output.dense")
        _layernorm(p, cl + ("v_output", "LayerNorm"), sd, f"{base}.v_output.LayerNorm")
        _linear(p, cl + ("t_intermediate", "dense"), sd, f"{base}.t_intermediate.dense")
        _linear(p, cl + ("t_output", "dense"), sd, f"{base}.t_output.dense")
        _layernorm(p, cl + ("t_output", "LayerNorm"), sd, f"{base}.t_output.LayerNorm")

    # Poolers
    _linear(p, ("bert", "t_pooler", "dense"), sd, "bert.t_pooler.dense")
    _linear(p, ("bert", "v_pooler", "dense"), sd, "bert.v_pooler.dense")

    # Classifier head (Sequential: 0 Dropout, 1 Linear, 2 ReLU, 3 Dropout, 4 Linear
    # — vilbert_facebook_arch.py:570-578)
    if "classifier.1.weight" in sd:
        _linear(p, ("classifier_dense",), sd, "classifier.1")
        _linear(p, ("classifier_out",), sd, "classifier.4")
    elif strict_head:
        raise KeyError("checkpoint has no classifier head (classifier.1.weight)")

    return p


def _get(tree: Mapping[str, Any], path: Tuple[str, ...]) -> np.ndarray:
    node: Any = tree
    for p in path:
        node = node[p]
    return np.asarray(node, np.float32)


def export_facebook_vilbert(
    params: Mapping[str, Any], cfg: ViLBERTConfig
) -> Dict[str, np.ndarray]:
    """Reverse converter: our Flax param tree → the Facebook-arch torch
    ``state_dict`` layout (the exact inverse of :func:`convert_facebook_vilbert`).

    Lets a model trained in this framework be loaded by the reference stack
    (its ``load_trained_model``, nodes.py:325-348, does
    ``load_state_dict(strict=False)`` on exactly these keys) or by any other
    consumer of Facebook-layout ViLBERT checkpoints. The two ``biOutput.
    q_dense1/q_dense2`` projections exist in every upstream checkpoint but are
    never applied in the reference forward (vilbert_facebook_arch.py:324-338),
    so we have no values for them — they are exported as zeros to keep strict
    loaders happy.

    Returns float32 numpy arrays (torch Linear weight = kernel.T, LayerNorm
    weight = scale, Embedding weight = embedding).
    """
    sd: Dict[str, np.ndarray] = {}

    def put(key: str, arr: np.ndarray):
        # np.array(copy=True): torch.from_numpy needs a writable owner, and
        # flax leaves arrive as read-only views of device buffers
        sd[key] = np.ascontiguousarray(np.array(arr, np.float32))

    def linear(key: str, prefix: Tuple[str, ...]):
        put(key + ".weight", _get(params, prefix + ("kernel",)).T)
        put(key + ".bias", _get(params, prefix + ("bias",)))

    def layernorm(key: str, prefix: Tuple[str, ...]):
        put(key + ".weight", _get(params, prefix + ("scale",)))
        put(key + ".bias", _get(params, prefix + ("bias",)))

    def embed(key: str, prefix: Tuple[str, ...]):
        put(key + ".weight", _get(params, prefix + ("embedding",)))

    def bert_layer(torch_prefix: str, flax_prefix: Tuple[str, ...]):
        for qkv in ("query", "key", "value"):
            linear(f"{torch_prefix}.attention.self.{qkv}", flax_prefix + ("attention", qkv))
        linear(f"{torch_prefix}.attention.output.dense", flax_prefix + ("attention_output", "dense"))
        layernorm(f"{torch_prefix}.attention.output.LayerNorm", flax_prefix + ("attention_output", "LayerNorm"))
        linear(f"{torch_prefix}.intermediate.dense", flax_prefix + ("intermediate", "dense"))
        linear(f"{torch_prefix}.output.dense", flax_prefix + ("output", "dense"))
        layernorm(f"{torch_prefix}.output.LayerNorm", flax_prefix + ("output", "LayerNorm"))

    for name in ("word_embeddings", "position_embeddings", "token_type_embeddings"):
        embed(f"bert.embeddings.{name}", ("bert", "embeddings", name))
    layernorm("bert.embeddings.LayerNorm", ("bert", "embeddings", "LayerNorm"))

    linear("bert.v_embeddings.image_embeddings", ("bert", "v_embeddings", "image_embeddings"))
    linear(
        "bert.v_embeddings.image_location_embeddings",
        ("bert", "v_embeddings", "image_location_embeddings"),
    )
    layernorm("bert.v_embeddings.LayerNorm", ("bert", "v_embeddings", "LayerNorm"))

    for i in range(cfg.num_hidden_layers):
        bert_layer(f"bert.encoder.layer.{i}", ("bert", "encoder", f"layer_{i}"))
    for i in range(cfg.v_num_hidden_layers):
        bert_layer(f"bert.encoder.v_layer.{i}", ("bert", "encoder", f"v_layer_{i}"))

    h, vh, bi = cfg.hidden_size, cfg.v_hidden_size, cfg.bi_hidden_size
    for i in range(len(cfg.co_attention_text_layers)):
        base = f"bert.encoder.c_layer.{i}"
        cl = ("bert", "encoder", f"c_layer_{i}")
        for proj in ("query1", "key1", "value1", "query2", "key2", "value2"):
            linear(f"{base}.biattention.{proj}", cl + (proj,))
        linear(f"{base}.biOutput.dense1", cl + ("v_output_attn", "dense"))
        layernorm(f"{base}.biOutput.LayerNorm1", cl + ("v_output_attn", "LayerNorm"))
        linear(f"{base}.biOutput.dense2", cl + ("t_output_attn", "dense"))
        layernorm(f"{base}.biOutput.LayerNorm2", cl + ("t_output_attn", "LayerNorm"))
        put(f"{base}.biOutput.q_dense1.weight", np.zeros((vh, bi)))
        put(f"{base}.biOutput.q_dense1.bias", np.zeros((vh,)))
        put(f"{base}.biOutput.q_dense2.weight", np.zeros((h, bi)))
        put(f"{base}.biOutput.q_dense2.bias", np.zeros((h,)))
        linear(f"{base}.v_intermediate.dense", cl + ("v_intermediate", "dense"))
        linear(f"{base}.v_output.dense", cl + ("v_output", "dense"))
        layernorm(f"{base}.v_output.LayerNorm", cl + ("v_output", "LayerNorm"))
        linear(f"{base}.t_intermediate.dense", cl + ("t_intermediate", "dense"))
        linear(f"{base}.t_output.dense", cl + ("t_output", "dense"))
        layernorm(f"{base}.t_output.LayerNorm", cl + ("t_output", "LayerNorm"))

    linear("bert.t_pooler.dense", ("bert", "t_pooler", "dense"))
    linear("bert.v_pooler.dense", ("bert", "v_pooler", "dense"))

    if "classifier_dense" in params:
        linear("classifier.1", ("classifier_dense",))
        linear("classifier.4", ("classifier_out",))
    return sd


def save_reference_checkpoint(
    path: str, params: Mapping[str, Any], cfg: ViLBERTConfig, metrics=None
) -> str:
    """Write our params as the reference's ``save_model`` artifact —
    ``{"model_state_dict": ..., "metrics": ...}`` (nodes.py:953-964) — so the
    reference's validate/inference pipelines can consume a model trained here."""
    import torch

    sd = {k: torch.from_numpy(v) for k, v in export_facebook_vilbert(params, cfg).items()}
    torch.save({"model_state_dict": sd, "metrics": dict(metrics or {})}, path)
    return path


def fabricate_facebook_state_dict(cfg, seed: int = 0, with_head: bool = True):
    """Random torch state dict with the EXACT Facebook-arch key layout
    (vilbert_facebook_arch.py:7-21; what ``load_facebook_weights`` consumes).

    Used by tests and the offline dry run of scripts/reproduce_lmdb_auroc.py
    to exercise :func:`convert_facebook_vilbert` without the real (network-
    gated) checkpoint. ``cfg`` is a ViLBERTConfig or a kwargs mapping.
    """
    import torch

    from multimodal_classification_tpu.config import facebook_vilbert_config

    if isinstance(cfg, Mapping):
        known = {
            f.name for f in __import__("dataclasses").fields(ViLBERTConfig)
        }
        cfg = facebook_vilbert_config(**{k: v for k, v in cfg.items() if k in known})
    g = torch.Generator().manual_seed(seed)
    sd: Dict[str, Any] = {}

    def lin(key, din, dout, scale=0.02):
        sd[f"{key}.weight"] = torch.randn(dout, din, generator=g) * scale
        sd[f"{key}.bias"] = torch.zeros(dout)

    def ln(key, d):
        sd[f"{key}.weight"] = torch.ones(d)
        sd[f"{key}.bias"] = torch.zeros(d)

    def emb(key, n, d):
        sd[f"{key}.weight"] = torch.randn(n, d, generator=g) * 0.02

    h, vh, bi = cfg.hidden_size, cfg.v_hidden_size, cfg.bi_hidden_size
    emb("bert.embeddings.word_embeddings", cfg.vocab_size, h)
    emb("bert.embeddings.position_embeddings", cfg.max_position_embeddings, h)
    emb("bert.embeddings.token_type_embeddings", cfg.type_vocab_size, h)
    ln("bert.embeddings.LayerNorm", h)
    lin("bert.v_embeddings.image_embeddings", cfg.v_feature_size, vh)
    lin("bert.v_embeddings.image_location_embeddings", 5, vh)
    ln("bert.v_embeddings.LayerNorm", vh)

    def bert_layer(pre, d, inter):
        for qkv in ("query", "key", "value"):
            lin(f"{pre}.attention.self.{qkv}", d, d)
        lin(f"{pre}.attention.output.dense", d, d)
        ln(f"{pre}.attention.output.LayerNorm", d)
        lin(f"{pre}.intermediate.dense", d, inter)
        lin(f"{pre}.output.dense", inter, d)
        ln(f"{pre}.output.LayerNorm", d)

    for i in range(cfg.num_hidden_layers):
        bert_layer(f"bert.encoder.layer.{i}", h, cfg.intermediate_size)
    for i in range(cfg.v_num_hidden_layers):
        bert_layer(f"bert.encoder.v_layer.{i}", vh, cfg.v_intermediate_size)
    for i in range(len(cfg.co_attention_text_layers)):
        base = f"bert.encoder.c_layer.{i}"
        for proj, din in (("query1", vh), ("key1", vh), ("value1", vh),
                          ("query2", h), ("key2", h), ("value2", h)):
            lin(f"{base}.biattention.{proj}", din, bi)
        lin(f"{base}.biOutput.dense1", bi, vh)
        ln(f"{base}.biOutput.LayerNorm1", vh)
        lin(f"{base}.biOutput.q_dense1", bi, vh)  # dead param, present upstream
        lin(f"{base}.biOutput.dense2", bi, h)
        ln(f"{base}.biOutput.LayerNorm2", h)
        lin(f"{base}.biOutput.q_dense2", bi, h)  # dead param, present upstream
        lin(f"{base}.v_intermediate.dense", vh, cfg.v_intermediate_size)
        lin(f"{base}.v_output.dense", cfg.v_intermediate_size, vh)
        ln(f"{base}.v_output.LayerNorm", vh)
        lin(f"{base}.t_intermediate.dense", h, cfg.intermediate_size)
        lin(f"{base}.t_output.dense", cfg.intermediate_size, h)
        ln(f"{base}.t_output.LayerNorm", h)

    lin("bert.t_pooler.dense", h, bi)
    lin("bert.v_pooler.dense", vh, bi)
    if with_head:
        lin("classifier.1", 2 * bi, cfg.classifier_hidden_size)
        lin("classifier.4", cfg.classifier_hidden_size, cfg.num_labels)
    return sd


CORE_PREFIXES = ("module.", "model.", "vilbert.")


def normalize_core_keys(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Strip wrapper prefixes the HF-hub checkpoints carry
    (reference vilbert_hf.py:183-198 candidate-key loop)."""
    out = {}
    for k, v in state_dict.items():
        for p in CORE_PREFIXES:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def convert_core_vilbert(
    state_dict: Mapping[str, Any], cfg: ViLBERTConfig
) -> Dict[str, Any]:
    """Convert a core-variant (symmetric 768-d) ViLBERT torch state dict —
    the layout of reference models/vilbert_core.py as saved by
    ViLBERTForClassification (``vilbert.*`` + ``classifier.*`` keys) and the
    HF-hub ``visualjoyce/transformers4vl-vilbert`` checkpoints.
    """
    sd = normalize_core_keys(state_dict)
    sd = {k: v for k, v in sd.items() if not k.startswith("cls.")}
    p: Dict[str, Any] = {}

    # text embeddings (from the wrapped HF BertModel)
    for name in ("word_embeddings", "position_embeddings", "token_type_embeddings"):
        key = f"bert.embeddings.{name}"
        if key + ".weight" in sd:
            _embed(p, ("bert", "embeddings", name), sd, key)
    if "bert.embeddings.LayerNorm.weight" in sd:
        _layernorm(p, ("bert", "embeddings", "LayerNorm"), sd, "bert.embeddings.LayerNorm")

    # visual embeddings (vilbert_core.py:419-480: image/location/position + LN)
    ve = "visual_embeddings"
    if f"{ve}.image_embeddings.weight" in sd:
        _linear(p, ("bert", "v_embeddings", "image_embeddings"), sd, f"{ve}.image_embeddings")
        _linear(
            p, ("bert", "v_embeddings", "image_location_embeddings"), sd,
            f"{ve}.location_embeddings",
        )
        _embed(p, ("bert", "v_embeddings", "position_embeddings"), sd,
               f"{ve}.position_embeddings")
        _layernorm(p, ("bert", "v_embeddings", "LayerNorm"), sd, f"{ve}.LayerNorm")

    def cross_attn(flax_prefix, torch_prefix):
        for qkv in ("query", "key", "value"):
            _linear(p, flax_prefix + (qkv,), sd, f"{torch_prefix}.self.{qkv}")

    for i in range(cfg.num_hidden_layers):
        if f"encoder.t_layer.{i}.attention.self.query.weight" in sd:
            _bert_layer(p, ("bert", "encoder", f"layer_{i}"), sd, f"encoder.t_layer.{i}")
    for i in range(cfg.v_num_hidden_layers):
        if f"encoder.v_layer.{i}.attention.self.query.weight" in sd:
            _bert_layer(p, ("bert", "encoder", f"v_layer_{i}"), sd, f"encoder.v_layer.{i}")
    for i in range(len(cfg.co_attention_text_layers)):
        base = f"encoder.c_layer.{i}"
        if f"{base}.biattention_v.self.query.weight" not in sd:
            continue
        cl = ("bert", "encoder", f"c_layer_{i}")
        cross_attn(cl + ("biattention_v",), f"{base}.biattention_v")
        _linear(p, cl + ("v_output_attn", "dense"), sd, f"{base}.biattention_v.output.dense")
        _layernorm(p, cl + ("v_output_attn", "LayerNorm"), sd, f"{base}.biattention_v.output.LayerNorm")
        cross_attn(cl + ("biattention_t",), f"{base}.biattention_t")
        _linear(p, cl + ("t_output_attn", "dense"), sd, f"{base}.biattention_t.output.dense")
        _layernorm(p, cl + ("t_output_attn", "LayerNorm"), sd, f"{base}.biattention_t.output.LayerNorm")
        _linear(p, cl + ("intermediate_v", "dense"), sd, f"{base}.intermediate_v.dense")
        _linear(p, cl + ("output_v", "dense"), sd, f"{base}.output_v.dense")
        _layernorm(p, cl + ("output_v", "LayerNorm"), sd, f"{base}.output_v.LayerNorm")
        _linear(p, cl + ("intermediate_t", "dense"), sd, f"{base}.intermediate_t.dense")
        _linear(p, cl + ("output_t", "dense"), sd, f"{base}.output_t.dense")
        _layernorm(p, cl + ("output_t", "LayerNorm"), sd, f"{base}.output_t.LayerNorm")

    # poolers (Sequential(Linear, Tanh) → index 0) and classifier head
    if "t_pooler.0.weight" in sd:
        _linear(p, ("bert", "t_pooler", "dense"), sd, "t_pooler.0")
        _linear(p, ("bert", "v_pooler", "dense"), sd, "v_pooler.0")
    if "classifier.1.weight" in sd:
        _linear(p, ("classifier_dense",), sd, "classifier.1")
        _linear(p, ("classifier_out",), sd, "classifier.4")
    return p


def merge_params(
    init_params: Mapping[str, Any], loaded: Mapping[str, Any]
) -> Tuple[Dict[str, Any], int, int]:
    """Overlay ``loaded`` onto ``init_params`` with shape checking.

    Returns (merged, n_loaded, n_total_leaves). Leaves present in init but
    absent from loaded keep their fresh initialisation (e.g. classifier head
    when starting from a pretraining checkpoint).
    """
    n_loaded = 0
    n_total = 0

    def merge(a, b, path=""):
        nonlocal n_loaded, n_total
        out = {}
        for k, v in a.items():
            sub = f"{path}/{k}"
            if isinstance(v, Mapping):
                out[k] = merge(v, b.get(k, {}) if isinstance(b, Mapping) else {}, sub)
            else:
                n_total += 1
                bv = b.get(k) if isinstance(b, Mapping) else None
                if bv is not None:
                    if tuple(bv.shape) != tuple(v.shape):
                        raise ValueError(
                            f"shape mismatch at {sub}: ckpt {bv.shape} vs model {v.shape}"
                        )
                    out[k] = np.asarray(bv, dtype=np.float32)
                    n_loaded += 1
                else:
                    out[k] = v
        return out

    merged = merge(dict(init_params), dict(loaded))
    return merged, n_loaded, n_total


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a .pt/.bin torch checkpoint to a {key: np.ndarray} dict.

    Accepts both raw state dicts and the reference's ``save_model`` format
    ``{"model_state_dict": ..., "metrics": ...}`` (nodes.py:953-964)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    # unwrap the wrapper layouts seen in the wild (reference
    # vilbert_hf.py:171-178 probes the same three)
    for wrapper in ("model_state_dict", "state_dict", "model"):
        if (
            isinstance(obj, dict)
            and wrapper in obj
            and isinstance(obj[wrapper], dict)
            and not any(k.startswith("bert.") for k in obj)
        ):
            obj = obj[wrapper]
            break
    return {k: _np(v) for k, v in obj.items() if hasattr(v, "shape")}
