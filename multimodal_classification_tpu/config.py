"""Configuration system.

Frozen dataclasses (hashable → usable as jit static args) plus a YAML loader
that preserves the reference's configuration surface: paired
``vilbert_<variant>`` / ``training_<variant>`` namespaces with fallback to the
default ``vilbert`` / ``training`` blocks
(reference: conf/base/parameters.yml + settings.py:27-38 OmegaConfigLoader,
selection convention in pipelines/model_training/nodes.py:214,720-723).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Dict, Mapping, Optional, Tuple

import yaml


# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ViLBERTConfig:
    """Two-stream ViLBERT configuration.

    Defaults reproduce Facebook's asymmetric architecture — the one behind
    every headline number in the reference
    (reference: models/vilbert_facebook_arch.py:35-60 get_facebook_vilbert_config).
    Text stream: 12 layers × 768 dim × 12 heads. Visual stream: 6 layers ×
    1024 dim × 8 heads. Cross-modal bi-attention in a 1024-d bi-space applied
    after text layers (1,3,5,7,9,11) (vilbert_facebook_arch.py:457).
    """

    # Text (BERT) stream
    hidden_size: int = 768
    num_attention_heads: int = 12
    num_hidden_layers: int = 12
    intermediate_size: int = 3072
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    vocab_size: int = 30522
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    # Visual stream
    v_hidden_size: int = 1024
    v_num_attention_heads: int = 8
    v_num_hidden_layers: int = 6
    v_intermediate_size: int = 1024
    v_hidden_dropout_prob: float = 0.1
    v_attention_probs_dropout_prob: float = 0.1

    # Co-attention
    bi_hidden_size: int = 1024
    bi_num_attention_heads: int = 8
    co_attention_text_layers: Tuple[int, ...] = (1, 3, 5, 7, 9, 11)

    # Visual input interface (all extractors emit [N, 2048] + [N, 5])
    v_feature_size: int = 2048
    v_loc_size: int = 5
    # Whether visual embeddings add a learned per-region position embedding
    # (the 768-d core variant does — vilbert_core.py:419-480; FB arch does not)
    v_use_position_embeddings: bool = False

    # Classification head
    num_labels: int = 2
    classifier_hidden_size: int = 1024
    classifier_dropout: float = 0.1
    # "cls" = first-token poolers (FB arch); "cls_mean" = [CLS]+mean-pool (core)
    pooling: str = "cls"

    # Numerics: params fp32, activations bfloat16 on the MXU
    dtype: str = "bfloat16"
    # Use the fused Pallas attention path when on TPU. Default OFF after
    # same-run A/B on v5e (round 2): at the flagship eval shapes XLA beats
    # the per-(batch,head)-program kernels at EVERY batch size —
    # batch 1: 3.25 vs 3.76 ms; 16: 9.26 vs 11.90; 64: 29.9 vs 41.0
    # (an eval XPlane profile shows 9.1 ms/step of kernel time at batch 64
    # vs ~2 ms of ideal attention FLOPs: grid-program overhead). The kernels
    # stay parity-tested and selectable for larger-sequence configs where
    # VMEM-resident scores pay off.
    use_pallas_attention: bool = False
    # Dispatch the Pallas kernels in TRAINING steps too (in-kernel dropout +
    # fused backward). Parity-tested and available, but measured 10.5% SLOWER
    # than XLA at the flagship shapes on v5e (40.2 vs 35.9 ms/step, batch 16,
    # 128+100 tokens: per-(batch,head) programs are too small to beat XLA's
    # batched fusions, and the fused backward recomputes scores) — so off by
    # default.
    pallas_attention_training: bool = False
    # Fuse each FFN's two matmuls into one VMEM-resident Pallas kernel at
    # EVAL time (gelu(x@W1+b1)@W2+b2 with the [rows, intermediate] activation
    # never leaving VMEM). Targets the serving/eval HBM bound the roofline
    # attribution identified (scripts/analyze_eval_hlo.py); training keeps the
    # unfused XLA path (the kernel's backward is recompute-based). No effect
    # off TPU or on int8-quantized layers. Default ON: measured faster at
    # EVERY serving shape on v5e (same-run A/B, scripts/bench_serving.py —
    # seq 32: 2.76 vs 3.20 ms @1, 15.7 vs 17.0 @64; seq 128: 8.1 vs 9.4 @16,
    # 25.6 vs 29.2 @64).
    fused_ffn: bool = True
    # Fuse each FFN residual BLOCK (both matmuls + in-kernel counter-hash
    # dropout + residual LayerNorm) into one Pallas kernel in TRAINING steps,
    # with a fused Pallas backward (one kernel producing dx and the per-row
    # exports, then two single-op XLA weight-gradient matmuls) — see
    # ops/pallas_kernels/fused_ffn_train.py. Targets the train step's
    # measured per-op overhead (59% of device time across ~1480 small
    # fusions). Text-stream 768/3072 FFNs only (the visual 1024/4096 weight
    # set exceeds the VMEM budget and keeps the unfused path per-layer).
    # Dropout bits come from the kernel's counter hash instead of
    # nn.Dropout's PRNG (same Bernoulli distribution; parity-tested against
    # the kernel's exact-bit XLA twin).
    # Default OFF: measured SLOWER on v5e at the flagship config in same-run
    # A/Bs (scripts/bench_train_fused.py, round 4) — 22.98 ms/step with the
    # row-grid kernels and 22.68 with the I-grid (512-row-dot) variant vs
    # 21.9-22.2 baseline. The backward's a/du/dd exports for the XLA
    # weight-grad matmuls add HBM round-trips XLA's own fused backward
    # avoids by folding gelu'/mask into its dot epilogues. Kept
    # parity-tested + selectable; see docs/PERFORMANCE.md.
    fused_ffn_training: bool = False
    # Fuse each self-attention SUB-BLOCK in TRAINING steps — the training
    # twin of fused_attn_block: q/k/v/out projections, masked softmax
    # attention with in-kernel attention-prob dropout, output dropout and
    # residual LayerNorm in one Pallas forward, plus a fused Pallas backward
    # (one kernel recomputing the attention internals and producing dx + the
    # per-row exports, then four single-op XLA weight-gradient matmuls) —
    # ops/pallas_kernels/fused_attn_block_train.py. Text-stream 768-d layers
    # only (the 1024-d visual stream exceeds the backward's VMEM budget and
    # keeps the unfused path per-layer).
    # Default ON: measured FASTER on v5e at the flagship train config in
    # four same-run A/B pairs (scripts/bench_train_fused.py, round 4):
    # 21.4-21.7 ms/step vs 21.9-22.7 baseline (~+3%, best 747 memes/s; one
    # 40 ms outlier under host contention discarded). Unlike the FFN
    # (fused_ffn_training, measured slower), the attention sub-block's many
    # small ops (scores, softmax, dropout, per-head context) fuse profitably
    # because its backward needs no large per-row exports beyond [R, H]
    # tensors. Training under an mp>1 mesh keeps the unfused path (whole-
    # weight kernel operands would all-gather; see Trainer.__init__).
    fused_attn_block_training: bool = True
    # Fuse each self-attention SUB-BLOCK (q/k/v/out projections + masked
    # softmax attention + residual LayerNorm) into one VMEM-resident Pallas
    # kernel at EVAL time — together with fused_ffn this turns a transformer
    # layer into two Pallas calls instead of ~10 XLA fusions. Targets the
    # per-fusion dispatch overhead that dominates the eval step at serving
    # shapes (batch-64 profile: ~212 fusions, dense ops ~10-60 µs each).
    # Weights stay resident across the row sweep; attention is computed
    # block-diagonally over whole batch items (see
    # ops/pallas_kernels/fused_attn_block.py). int8-quantized layers use the
    # int8 variant (input quantized once for q/k/v). Training keeps the
    # unfused path. Default ON: measured faster at every serving shape in
    # the same-run v5e A/B (seq-32 bucket; bf16: 3.09 vs 3.62 ms @1,
    # 4209 vs 3724/s @64; int8: 3512 vs 3322/s @16, 5232 vs 4876/s @64 —
    # the new serving record). Text-stream layers only at the flagship
    # config (the 1024-d visual layers exceed the VMEM budget and fall back
    # per-layer).
    fused_attn_block: bool = True
    # Fuse each co-attention DIRECTION (q + cross-stream k/v projections +
    # masked cross-attention + output projection + residual LayerNorm) into
    # one VMEM-resident Pallas kernel at EVAL time — a BiAttention block
    # becomes two kernels + the two (already fused) per-stream FFNs
    # (ops/pallas_kernels/fused_co_block.py). Same dispatch rules as
    # fused_attn_block, plus a measured batch/quantization policy:
    #   "auto" (default) — fuse the int8 path: at EVERY batch when
    #     fused_text_layer is on (round-4 re-validation, 2 reps × batches
    #     16/64/112 seq 32: lyr8 3974/3836 vs lyr8nc 3431/3334 @16 (+15%),
    #     5565/5852 vs 5519/5736 @64, 6249/6298 vs 6071/6176 @112 — once
    #     the text layers are single kernels the unfused co-attention's
    #     small-op overhead dominates), and only at batch >= 32 without it
    #     (coa8 3437 vs blk8 3931 @16 — the round-3 finding still holds on
    #     the two-kernel path). bf16 loses or ties everywhere (coa 2899/2909
    #     vs blk 3067/2998 @16; within noise @112) — auto always refuses it.
    #   True — always fuse where shapes allow (A/B escape hatch).
    #   False — never.
    fused_co_attn: "bool | str" = "auto"
    # Fuse each WHOLE int8 text layer (attention block + FFN + residual LN —
    # six int8 weight matrices VMEM-resident) into ONE Pallas kernel at EVAL
    # time (ops/pallas_kernels/fused_layer.py). Motivated by the batch-112
    # record-config profile: the 12 text layers ran at ~50% of their int8
    # roofline across 24 small kernel calls while the visual FFN kernel hit
    # ~100% — one call per layer halves dispatch count and keeps the
    # attention output in VMEM. int8-only (the bf16 weight set is 14.2 MB,
    # over the VMEM budget) and text-only (visual 1024/4096 refused by the
    # budget); anything unsupported falls back to the two-kernel path
    # per-layer. Default ON: same-run v5e A/B vs the two-kernel path (int8,
    # seq-32 bucket) — 6248 vs 6062/s @112 (+3%, the serving record),
    # 5779 vs 5715 @64, 3611 vs 2435 @16 (+48%: small-row calls suffer the
    # most per-call overhead). Batch 1 measured SLOWER (12.7 vs 9.3 ms) —
    # single-item latency deployments use bf16 anyway (see
    # docs/PERFORMANCE.md int8 policy).
    fused_text_layer: bool = True
    # Pad the visual stream ONCE to the 16-row sublane tile (100 regions →
    # 112) for the whole eval encoder instead of per fused-kernel call —
    # removes the ~0.5 ms/step of pad/reshape/slice glue the batch-64
    # XPlane profile showed around the Pallas calls. Padded rows carry
    # NEG_INF key bias (identical masked-attention function, parity-tested)
    # and are sliced off after the encoder. Inert off-TPU, in training, and
    # when no per-item-padding kernel is enabled.
    visual_stream_padding: bool = True
    # Rematerialise encoder layers to trade FLOPs for HBM
    remat: bool = False
    # Scan-over-layers: run the encoder as ONE nn.scan over its regular
    # superlayer repeat ([text×2 → visual → co-attention] ×6 in the FB
    # config) with params stacked [6, ...]. Targets the measured per-op
    # overhead of the 22 ms train step (scripts/profile_step.py: 59% of
    # device time in ~1480 small fusions + 20% in ~4200 loop-carry copies of
    # ~600 small param tensors — stacking cuts both counts ~6× for encoder
    # params). Engages only when the layer layout is regular
    # (co-attention after every 2nd text layer, v_layers = text_layers/2 —
    # true for the FB, core, and tiny configs); param layout changes to
    # stacked leaves (models/stacking.py converts in both directions, and
    # converters/serving keep the canonical per-layer tree). Incompatible
    # with freeze_bert_layers (can't freeze half a stacked leaf).
    stacked_encoder: bool = False

    @property
    def bi_head_dim(self) -> int:
        return self.bi_hidden_size // self.bi_num_attention_heads


def facebook_vilbert_config(**overrides: Any) -> ViLBERTConfig:
    """The exact config of reference models/vilbert_facebook_arch.py:35-60."""
    return ViLBERTConfig(**overrides)


def core_vilbert_config(**overrides: Any) -> ViLBERTConfig:
    """Symmetric 768-d variant (reference: models/vilbert_core.py:668-688):
    both streams 768-d, co-attention after every 2nd text layer, [CLS]+mean
    pooling head, learned visual position embeddings."""
    base = dict(
        v_hidden_size=768,
        v_num_attention_heads=12,
        v_num_hidden_layers=6,
        v_intermediate_size=3072,
        bi_hidden_size=768,
        bi_num_attention_heads=12,
        classifier_hidden_size=512,
        pooling="cls_mean",
        v_use_position_embeddings=True,
    )
    base.update(overrides)
    return ViLBERTConfig(**base)


def tiny_vilbert_config(**overrides: Any) -> ViLBERTConfig:
    """Small config for tests/CI: same topology, tiny dims."""
    base = dict(
        hidden_size=64,
        num_attention_heads=4,
        num_hidden_layers=4,
        intermediate_size=128,
        vocab_size=512,
        max_position_embeddings=64,
        v_hidden_size=96,
        v_num_attention_heads=4,
        v_num_hidden_layers=2,
        v_intermediate_size=96,
        bi_hidden_size=96,
        bi_num_attention_heads=4,
        co_attention_text_layers=(1, 3),
        v_feature_size=128,
        classifier_hidden_size=96,  # == bi_hidden_size, as in the FB arch head
    )
    base.update(overrides)
    return ViLBERTConfig(**base)


# ---------------------------------------------------------------------------
# Training / data configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TrainingConfig:
    """Optimizer/loop hyperparameters (reference: conf/base/parameters.yml:40-65)."""

    batch_size: int = 32
    num_epochs: int = 20
    learning_rate: float = 1e-5
    weight_decay: float = 0.01
    warmup_steps: int = 2000
    early_stopping_patience: int = 5
    gradient_clip: float = 1.0
    loss_type: str = "ce"  # ce | focal | label_smoothing | focal_smoothing | weighted
    focal_alpha: float = 0.35
    focal_gamma: float = 2.0
    label_smoothing: float = 0.0
    class_weights: Optional[Tuple[float, ...]] = None
    use_linear_decay: bool = True
    seed: int = 42
    # dropout PRNG implementation: "rbg" is ~1.4× faster end-to-end on TPU
    # than threefry at this model scale (hardware RNG vs software hashing)
    rng_impl: str = "rbg"
    # Adam moment dtypes: bf16 halves the HBM-bound optimizer pass's traffic
    # per moment (accumulation stays fp32 — training/optimizers.py); set
    # "float32" for exact torch parity
    adam_mu_dtype: str = "bfloat16"
    adam_nu_dtype: str = "bfloat16"
    # Gradient storage dtype. "bfloat16" rounds each gradient once (0.4%
    # relative — well under batch noise) and halves the gradient all-reduce
    # bytes on ICI in the multi-chip path. Measured SLOWER single-chip
    # (22.8 → 23.2 ms/step at 250M params: the cast does not fuse into the
    # backward on this XLA version, so it adds a pass instead of halving
    # traffic) — keep "float32" for single-chip. Accumulation inside the
    # optimizer stays fp32 either way. Do NOT combine "bfloat16" with
    # grad_accum_steps>1 (MultiSteps would accumulate in bf16) —
    # make_optimizer raises in that case.
    grads_dtype: str = "float32"
    # TPU-native additions (no reference counterpart — see SURVEY.md §2.7):
    # data-parallel × model-parallel mesh, remat, grad accumulation.
    mesh_shape: Tuple[int, ...] = (-1, 1)  # (dp, mp); -1 = all remaining devices
    mesh_axis_names: Tuple[str, ...] = ("dp", "mp")
    grad_accum_steps: int = 1
    log_every_steps: int = 50
    checkpoint_dir: str = "data/05_model_output"
    keep_checkpoints: int = 3
    # HBM capacity cap for the device-resident TRAIN dataset (bytes; None =
    # uncapped). When the tensorised train set exceeds the cap, training
    # rotates fixed equal shards through a double-buffered device window
    # (data/rotation.py) instead of silently falling back to the
    # transfer-bound host-fed loader (~17× slower on this relay, round 1).
    device_cache_max_bytes: Optional[int] = None
    # Flat-slab params/optimizer (training/flat_slab.py): small param leaves
    # + Adam moments live as contiguous per-dtype buffers through the whole
    # step. Measured +0.8% at the flagship config (within relay variance —
    # see docs/PERFORMANCE.md); single-chip device-resident path only,
    # incompatible with freeze_bert_layers. Checkpoints stay in the
    # canonical per-leaf layout either way.
    flat_slab: bool = False


@dataclass(frozen=True)
class DataConfig:
    """Data/preprocessing parameters (reference: parameters.yml vilbert_* blocks)."""

    max_seq_length: int = 128
    max_regions: int = 36
    visual_feature_dim: int = 2048
    image_size: int = 224
    feature_extractor: str = "resnet"
    extractor_kwargs: Mapping[str, Any] = field(default_factory=dict)
    tokenizer_vocab: Optional[str] = None  # path to vocab.txt; None = bundled/HF cache
    lowercase: bool = True
    num_workers: int = 2  # host prefetch threads (reference forces 0 everywhere)
    prefetch_depth: int = 2  # double-buffered device feed
    shuffle_seed: int = 42
    # keep the tensorised dataset resident in HBM and gather batches on
    # device (precomputed-feature pipelines, single-chip dp; see
    # data/device_cache.py) instead of streaming batches from the host
    device_resident: bool = False
    # slice the text axis to the dataset's real max token length rounded up
    # to a multiple of 32 (0 = off). Attention over padded keys is masked, so
    # this computes the identical function while skipping the padding FLOPs
    # the reference always spends (max_seq_length is a CAP, not a width).
    text_bucket_multiple: int = 32
    # dtype of dense float fields on the host→device link ("bfloat16" halves
    # transfer bytes; matches the model's compute dtype)
    wire_dtype: str = "bfloat16"
    # dataset source paths
    lmdb_path: Optional[str] = None
    hdf5_features_path: Optional[str] = None
    data_dir: str = "data/01_raw/hateful_memes"


@dataclass(frozen=True)
class ExperimentConfig:
    """One experiment = model + training + data, like a paired
    vilbert_<variant>/training_<variant> namespace in the reference."""

    name: str = "vilbert"
    model: ViLBERTConfig = field(default_factory=ViLBERTConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    data: DataConfig = field(default_factory=DataConfig)
    freeze_bert_layers: int = 0
    pretrained_checkpoint: Optional[str] = None
    output_dir: str = "data/05_model_output"
    # int8 MXU serving for validate/inference pipelines: quantize large Dense
    # kernels offline (ops/quant.py) and run eval matmuls int8×int8→int32 —
    # 2× the bf16 MXU rate on v5e. Training is never quantized. Kernels with
    # min(shape) < serving_int8_min_dim stay float (cheap + precision-critical).
    serving_int8: bool = False
    serving_int8_min_dim: int = 256
    # Serving seq-length buckets (ascending, < max_seq_length; the full
    # length is always appended): each request batch dispatches the smallest
    # compiled seq length that fits its longest text. () = single program.
    serving_seq_buckets: Tuple[int, ...] = ()


# ---------------------------------------------------------------------------
# YAML parameter loading (reference parameters.yml surface)
# ---------------------------------------------------------------------------

_MODEL_KEYS = {f.name for f in dataclasses.fields(ViLBERTConfig)}
_TRAIN_KEYS = {f.name for f in dataclasses.fields(TrainingConfig)}
_DATA_KEYS = {f.name for f in dataclasses.fields(DataConfig)}


def _filter(d: Mapping[str, Any], keys) -> Dict[str, Any]:
    out = {}
    for k, v in d.items():
        if k in keys:
            if isinstance(v, list):
                v = tuple(v)
            out[k] = v
    return out


def load_parameters(*paths: str) -> Dict[str, Any]:
    """Load and shallow-merge YAML parameter files (later paths override —
    mirrors the reference's base/local config environments, settings.py:27-38)."""
    params: Dict[str, Any] = {}
    for p in paths:
        if p and os.path.exists(p):
            with open(p) as f:
                loaded = yaml.safe_load(f) or {}
            for k, v in loaded.items():
                if isinstance(v, dict) and isinstance(params.get(k), dict):
                    params[k] = {**params[k], **v}
                else:
                    params[k] = v
    return params


def _parse_override_scalar(raw: str):
    """YAML-parse one override value, then rescue numerics YAML 1.1 misses:
    ``3e-5`` (no dot in the mantissa) resolves to a *string* under pyyaml's
    float tag, but a CLI user typing a learning rate means the float."""
    if raw == "":
        return None
    value = yaml.safe_load(raw)
    if isinstance(value, str):
        try:
            return int(value)
        except ValueError:
            pass
        try:
            return float(value)
        except ValueError:
            pass
    return value


def apply_param_overrides(params: Dict[str, Any], overrides) -> Dict[str, Any]:
    """Apply ``dotted.key=value`` overrides onto a parameters dict (the
    reference's ``kedro run --params key=value`` surface, __main__.py:12-24).

    Values parse as YAML scalars (``lr=3e-5`` → float, ``freeze=true`` →
    bool, ``name=lmdb`` → str). Dotted paths create intermediate dicts."""
    for item in overrides:
        key, _, raw = item.partition("=")
        if not _ or not key:
            raise ValueError(f"override must be dotted.key=value, got {item!r}")
        value = _parse_override_scalar(raw)
        node = params
        parts = key.split(".")
        for p in parts[:-1]:
            nxt = node.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
                node[p] = nxt
            node = nxt
        node[parts[-1]] = value
    return params


# ablation pipeline variants are "<base>_<axis>" (the reference's regression
# grid, parameters.yml:592-595 etc.); the base determines the feature source
# and provides the config-fallback layer between the defaults and the
# ablation block
ABLATION_SUFFIXES = ("_b32", "_freeze6", "_focal")


def base_variant(variant: str) -> str:
    """'lmdb_freeze6' -> 'lmdb'; non-ablation variants pass through."""
    for s in ABLATION_SUFFIXES:
        if variant.endswith(s):
            return variant[: -len(s)]
    return variant


def experiment_from_parameters(
    params: Mapping[str, Any], variant: str = ""
) -> ExperimentConfig:
    """Build an ExperimentConfig from a parameters dict.

    ``variant=""`` reads the default ``vilbert``/``training`` blocks;
    ``variant="lmdb"`` reads ``vilbert_lmdb``/``training_lmdb`` with fallback
    to the defaults — the exact selection convention of the reference
    (nodes.py:214 config_key, :720-723 training params fallback). Ablation
    variants (``lmdb_freeze6``) additionally merge their base variant's
    blocks (``vilbert_lmdb``) between the defaults and their own, so an
    ablation block only needs to state the axis it changes.
    """
    suffix = f"_{variant}" if variant else ""
    model_block = dict(params.get("vilbert", {}) or {})
    train_block = dict(params.get("training", {}) or {})
    base = base_variant(variant)
    if base != variant:
        model_block.update(params.get(f"vilbert_{base}", {}) or {})
        train_block.update(params.get(f"training_{base}", {}) or {})
    model_block.update(params.get(f"vilbert{suffix}", {}) or {})
    train_block.update(params.get(f"training{suffix}", {}) or {})
    data_proc = dict(params.get("data_processing", {}) or {})

    arch = model_block.get("arch", "facebook")
    model_kwargs = _filter(model_block, _MODEL_KEYS)
    model_cfg = (
        core_vilbert_config(**model_kwargs)
        if arch == "core"
        else facebook_vilbert_config(**model_kwargs)
    )

    train_kwargs = _filter(train_block, _TRAIN_KEYS)
    if "random_seed" in data_proc:
        train_kwargs.setdefault("seed", data_proc["random_seed"])
    train_cfg = TrainingConfig(**train_kwargs)

    data_kwargs = _filter({**data_proc, **model_block}, _DATA_KEYS)
    ex_kw = model_block.get("extractor_kwargs")
    if ex_kw:
        data_kwargs["extractor_kwargs"] = dict(ex_kw)
    data_cfg = DataConfig(**data_kwargs)

    return ExperimentConfig(
        name=f"vilbert{suffix}" if suffix else "vilbert",
        model=model_cfg,
        training=train_cfg,
        data=data_cfg,
        freeze_bert_layers=int(model_block.get("freeze_bert_layers", 0) or 0),
        pretrained_checkpoint=model_block.get("pretrained_checkpoint")
        or model_block.get("checkpoint_path"),
        output_dir=model_block.get("output_dir", "data/05_model_output"),
        serving_int8=bool(model_block.get("serving_int8", False)),
        serving_int8_min_dim=int(model_block.get("serving_int8_min_dim", 256)),
        serving_seq_buckets=tuple(
            int(b) for b in model_block.get("serving_seq_buckets", ())
        ),
    )


def default_parameter_paths(root: str = ".") -> Tuple[str, str]:
    """(base, local) parameter file paths, matching the reference's conf tree."""
    return (
        os.path.join(root, "conf", "base", "parameters.yml"),
        os.path.join(root, "conf", "local", "parameters.yml"),
    )
