"""Transformer building blocks (Flax), BERT-exact semantics.

Pure-functional re-design of the reference's torch blocks
(reference: models/vilbert_core.py:25-330, models/vilbert_facebook_arch.py:110-408):
post-LayerNorm residual blocks, erf-GELU, LayerNorm eps 1e-12, truncated
normal(0.02) init. Params stay float32; matmuls run in the configured compute
dtype (bfloat16 on the MXU); LayerNorm/softmax accumulate in float32.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_classification_tpu.ops.attention import (
    attention_core,
    merge_heads,
    split_heads,
)

DEFAULT_INIT = nn.initializers.normal(stddev=0.02)


class QuantizableDense(nn.Module):
    """``nn.Dense`` with an optional int8 serving path.

    Param layout and init are identical to ``nn.Dense`` ("kernel", "bias" at
    the same path with the same initializers), so checkpoints and converters
    are unaffected. When ``apply`` receives a ``"quant"`` collection holding
    ``{qkernel: int8, wscale: f32}`` at this module's path (built offline by
    ``ops.quant.build_quant_tree`` from trained params), the matmul runs
    int8×int8→int32 on the MXU with dynamic per-row activation scales —
    2× the bf16 MXU rate on v5e. Without it, behavior is exactly the
    float path the training/parity tests pin down.
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        kernel = self.param(
            "kernel", DEFAULT_INIT, (jnp.shape(x)[-1], self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        if return_params:
            # escape hatch for fused multi-layer kernels (ops.pallas_kernels.
            # fused_ffn): hand the raw params to the caller, tagged with the
            # path this layer would take, so it can run both matmuls in one
            # VMEM-resident pass. Param creation above is identical to the
            # compute path, so checkpoints are unaffected. Refused (None)
            # during calibration (the sow must run) and for STATIC-calibrated
            # int8 layers (the fused kernel only implements dynamic per-row
            # scales; the static path is already throughput-neutral unfused).
            if self.is_mutable_collection("calib"):
                return None
            if self.has_variable("quant", "qkernel"):
                if self.has_variable("quant", "ascale"):
                    return None
                return (
                    "int8",
                    self.get_variable("quant", "qkernel"),
                    self.get_variable("quant", "wscale"),
                    bias,
                )
            return ("float", kernel, bias)
        if self.is_mutable_collection("calib"):
            # calibration pass (ops.quant.calibrate_quant_tree): record the
            # largest input magnitude this layer sees across the batches
            self.sow(
                "calib", "amax", jnp.max(jnp.abs(x.astype(jnp.float32))),
                init_fn=lambda: jnp.zeros((), jnp.float32), reduce_fn=jnp.maximum,
            )
        if self.has_variable("quant", "qkernel"):
            from multimodal_classification_tpu.ops.quant import int8_dot

            ascale = (
                self.get_variable("quant", "ascale")
                if self.has_variable("quant", "ascale") else None
            )
            y = int8_dot(
                x, self.get_variable("quant", "qkernel"),
                self.get_variable("quant", "wscale"), ascale=ascale,
            ).astype(self.dtype)
            return y + bias.astype(self.dtype)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = jax.lax.dot_general(x, kernel, (((x.ndim - 1,), (0,)), ((), ())))
        return y + bias


def make_dense(features: int, dtype, name: Optional[str] = None) -> QuantizableDense:
    return QuantizableDense(features, dtype=dtype, name=name)


def make_layernorm(name: Optional[str] = None) -> nn.LayerNorm:
    # fp32 LayerNorm regardless of activation dtype (reference eps: 1e-12,
    # vilbert_facebook_arch.py:63-77 BertLayerNorm)
    return nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, param_dtype=jnp.float32, name=name)


class SelfAttention(nn.Module):
    """Multi-head self-attention projections + core
    (reference: vilbert_core.py:41-89 BertSelfAttention)."""

    hidden_size: int
    num_heads: int
    dropout_rate: float
    dtype: jnp.dtype = jnp.bfloat16
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, hidden, bias, deterministic: bool,
                 params_only: bool = False):
        # NOTE: concatenating q/k/v into one fused matmul was measured SLOWER
        # end-to-end on v5e (22.0 → 22.8 ms/step) — XLA already schedules the
        # three matmuls well and the weight concat adds per-step traffic.
        if params_only:
            # probe for the fused attention-block kernel (ops/pallas_kernels/
            # fused_attn_block.py): raw tagged params, no compute
            return (
                make_dense(self.hidden_size, self.dtype, "query")(hidden, return_params=True),
                make_dense(self.hidden_size, self.dtype, "key")(hidden, return_params=True),
                make_dense(self.hidden_size, self.dtype, "value")(hidden, return_params=True),
            )
        q = make_dense(self.hidden_size, self.dtype, "query")(hidden)
        k = make_dense(self.hidden_size, self.dtype, "key")(hidden)
        v = make_dense(self.hidden_size, self.dtype, "value")(hidden)
        rng = None
        rate = 0.0
        if not deterministic and self.dropout_rate > 0.0:
            rng = self.make_rng("dropout")
            rate = self.dropout_rate
        ctx = attention_core(
            split_heads(q, self.num_heads),
            split_heads(k, self.num_heads),
            split_heads(v, self.num_heads),
            bias,
            dropout_rate=rate,
            dropout_rng=rng,
            impl=self.attention_impl,
        )
        return merge_heads(ctx)


class CrossAttention(nn.Module):
    """Q from one stream, K/V from the other
    (reference: vilbert_core.py:91-145 BertCoAttention)."""

    hidden_size: int
    num_heads: int
    dropout_rate: float
    dtype: jnp.dtype = jnp.bfloat16
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, query_stream, kv_stream, kv_bias, deterministic: bool):
        q = make_dense(self.hidden_size, self.dtype, "query")(query_stream)
        k = make_dense(self.hidden_size, self.dtype, "key")(kv_stream)
        v = make_dense(self.hidden_size, self.dtype, "value")(kv_stream)
        rng = None
        rate = 0.0
        if not deterministic and self.dropout_rate > 0.0:
            rng = self.make_rng("dropout")
            rate = self.dropout_rate
        ctx = attention_core(
            split_heads(q, self.num_heads),
            split_heads(k, self.num_heads),
            split_heads(v, self.num_heads),
            kv_bias,
            dropout_rate=rate,
            dropout_rng=rng,
            impl=self.attention_impl,
        )
        return merge_heads(ctx)


class ResidualOutput(nn.Module):
    """dense → dropout → LayerNorm(x + residual)
    (reference: BertSelfOutput/BertOutput, vilbert_core.py:148-201)."""

    hidden_size: int
    dropout_rate: float
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, hidden, residual=None, deterministic: bool = True,
                 params_only: bool = False, precomputed=None,
                 with_ln: bool = False):
        dense = make_dense(self.hidden_size, self.dtype, "dense")
        if params_only:
            p = dense(hidden, return_params=True)
            if not with_ln:
                return p
            # probe the LayerNorm params too (fused attention-block kernel
            # applies the residual LN in-kernel). The zeros call creates the
            # params exactly as the compute path would; its result is dead
            # code XLA removes.
            ln = make_layernorm("LayerNorm")
            _ = ln(jnp.zeros((1, self.hidden_size), jnp.float32))
            lnp = ln.variables["params"]
            return p, lnp["scale"], lnp["bias"]
        h = precomputed if precomputed is not None else dense(hidden)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        out = make_layernorm("LayerNorm")(h.astype(jnp.float32) + residual.astype(jnp.float32))
        return out.astype(self.dtype)


class Intermediate(nn.Module):
    """dense → erf-GELU (reference: BertIntermediate, vilbert_core.py:167-181)."""

    intermediate_size: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, hidden, params_only: bool = False):
        dense = make_dense(self.intermediate_size, self.dtype, "dense")
        if params_only:
            return dense(hidden, return_params=True)
        return nn.gelu(dense(hidden), approximate=False)


def apply_ffn(inter_mod: "Intermediate", out_mod: "ResidualOutput", x,
              deterministic: bool, fused: bool, train_rng=None):
    """FFN block ``LN(x + dropout(gelu(x@W1+b1)@W2+b2))`` through bound
    ``Intermediate``/``ResidualOutput`` modules.

    With ``fused`` (eval-time, config.fused_ffn) the two matmuls run as one
    VMEM-resident Pallas kernel — the [rows, intermediate] activation never
    round-trips HBM, the avoidable half of the FFN's memory traffic
    (reference chain: BertIntermediate→BertOutput, vilbert_core.py:167-201).
    When both denses are int8-quantized (serving int8 path) the int8 fused
    kernel runs instead: int8 MXU dots with the int8 weights VMEM-resident.
    Param layout is identical either way; falls back to the unfused path off
    TPU, at unsupported shapes, under calibration, for static-calibrated
    int8 layers, and when the two denses took different paths.

    With ``train_rng`` set (training-time, config.fused_ffn_training) the
    WHOLE block — both matmuls, in-kernel counter-hash dropout, residual
    LayerNorm — runs as one Pallas kernel with a fused Pallas backward
    (ops/pallas_kernels/fused_ffn_train.py). Dropout bits then come from the
    kernel's hash instead of nn.Dropout's PRNG stream — same Bernoulli(rate)
    distribution, different bits (training semantics preserved; parity tests
    pin the kernel against its exact-bit XLA twin).
    """
    if train_rng is not None and not deterministic:
        p1 = inter_mod(x, params_only=True)
        p2 = (
            out_mod(jnp.zeros((1, p1[1].shape[1]), x.dtype), params_only=True,
                    with_ln=True)
            if p1 is not None and p1[0] == "float" else None
        )
        if p2 is not None and p2[0] is not None and p2[0][0] == "float":
            (po, ln_scale, ln_bias) = p2
            from multimodal_classification_tpu.ops.pallas_kernels import (
                maybe_fused_ffn_train,
            )

            thunk = maybe_fused_ffn_train(
                x, p1[1], p1[2], po[1], po[2], ln_scale, ln_bias,
                out_mod.dropout_rate, train_rng,
            )
            if thunk is not None:
                return thunk()
        return out_mod(inter_mod(x), x, deterministic)
    if fused:
        p1 = inter_mod(x, params_only=True)
        # the probe only supplies the output dense's in-features (= the
        # intermediate width) for shape inference; no compute happens
        p2 = (
            out_mod(jnp.zeros((1, p1[1].shape[1]), x.dtype), params_only=True)
            if p1 is not None else None
        )
        thunk = None
        if p2 is not None and p1[0] == p2[0]:
            from multimodal_classification_tpu.ops.pallas_kernels import (
                maybe_fused_ffn,
                maybe_fused_ffn_int8,
            )

            if p1[0] == "float":
                thunk = maybe_fused_ffn(x, p1[1], p1[2], p2[1], p2[2])
            else:
                thunk = maybe_fused_ffn_int8(
                    x, p1[1], p1[2], p1[3], p2[1], p2[2], p2[3]
                )
        if thunk is not None:
            return out_mod(x, x, deterministic, precomputed=thunk())
    return out_mod(inter_mod(x), x, deterministic)


class TransformerLayer(nn.Module):
    """Post-LN BERT layer: self-attn + FFN (reference: BertLayer)."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    hidden_dropout: float
    attention_dropout: float
    dtype: jnp.dtype = jnp.bfloat16
    attention_impl: str = "auto"
    fused_ffn: bool = False
    fused_block: bool = False
    fused_layer: bool = False
    fused_ffn_train: bool = False
    fused_block_train: bool = False

    @nn.compact
    def __call__(self, hidden, bias, deterministic: bool):
        attn = SelfAttention(
            self.hidden_size,
            self.num_heads,
            self.attention_dropout,
            self.dtype,
            self.attention_impl,
            name="attention",
        )
        out_mod = ResidualOutput(
            self.hidden_size, self.hidden_dropout, self.dtype, name="attention_output"
        )
        inter_mod = Intermediate(self.intermediate_size, self.dtype, name="intermediate")
        ffn_out_mod = ResidualOutput(
            self.hidden_size, self.hidden_dropout, self.dtype, name="output"
        )
        if self.fused_layer and deterministic:
            y = _try_fused_layer(attn, out_mod, inter_mod, ffn_out_mod,
                                 hidden, bias, self.num_heads)
            if y is not None:
                return y
        attn_out = None
        if self.fused_block and deterministic:
            attn_out = _try_fused_attn_block(
                attn, out_mod, hidden, bias, self.num_heads)
        if (attn_out is None and self.fused_block_train and not deterministic
                and self.has_rng("dropout")):
            attn_out = _try_fused_attn_block_train(
                attn, out_mod, hidden, bias, self.num_heads,
                self.attention_dropout, self.hidden_dropout,
                self.make_rng("dropout"))
        if attn_out is None:
            attn_ctx = attn(hidden, bias, deterministic)
            attn_out = out_mod(attn_ctx, hidden, deterministic)
        train_rng = (
            self.make_rng("dropout")
            if self.fused_ffn_train and not deterministic
            and self.has_rng("dropout") else None
        )
        return apply_ffn(
            inter_mod, ffn_out_mod, attn_out, deterministic, self.fused_ffn,
            train_rng=train_rng,
        )


def _try_fused_layer(attn_mod: "SelfAttention", out_mod: "ResidualOutput",
                     inter_mod: "Intermediate", ffn_out_mod: "ResidualOutput",
                     hidden, bias, num_heads: int):
    """Dispatch a WHOLE int8 transformer layer (attention block + FFN +
    residual LN) to one Pallas kernel (ops/pallas_kernels/fused_layer.py).
    Returns None — falling back to the attn-block + FFN two-kernel path —
    off TPU, at unsupported shapes (the visual 1024/4096 stream exceeds the
    VMEM budget), on the float path (its six bf16 weight matrices do not
    fit VMEM), under calibration, or for static-calibrated int8 layers.
    Eval only (caller gates on deterministic)."""
    probes = attn_mod(hidden, None, True, params_only=True)
    out_probe = out_mod(hidden, params_only=True, with_ln=True)
    if out_probe is None or any(p is None for p in probes):
        return None
    (pq, pk, pv), (po, ln1_s, ln1_b) = probes, out_probe
    if po is None:
        return None
    p1 = inter_mod(hidden, params_only=True)
    if p1 is None:
        return None
    # probe input sized by the intermediate width — the output dense's
    # kernel param takes its in-features from the probe's last dim
    p2_probe = ffn_out_mod(jnp.zeros((1, p1[1].shape[1]), hidden.dtype),
                           params_only=True, with_ln=True)
    if p2_probe is None:
        return None
    p2, ln2_s, ln2_b = p2_probe
    if p2 is None:
        return None
    if {pq[0], pk[0], pv[0], po[0], p1[0], p2[0]} != {"int8"}:
        return None
    b, s, _ = hidden.shape
    key_bias = (
        bias.reshape(b, s).astype(jnp.float32)
        if bias is not None else jnp.zeros((b, s), jnp.float32)
    )
    from multimodal_classification_tpu.ops.pallas_kernels import (
        maybe_fused_layer_int8,
    )

    thunk = maybe_fused_layer_int8(
        hidden, key_bias,
        pq[1], pq[2], pq[3], pk[1], pk[2], pk[3], pv[1], pv[2], pv[3],
        po[1], po[2], po[3], ln1_s, ln1_b,
        p1[1], p1[2], p1[3], p2[1], p2[2], p2[3], ln2_s, ln2_b, num_heads,
    )
    return thunk() if thunk is not None else None


def _try_fused_attn_block_train(attn_mod: "SelfAttention",
                                out_mod: "ResidualOutput",
                                hidden, bias, num_heads: int,
                                rate_attn: float, rate_hidden: float, rng):
    """Dispatch the whole attention sub-block to the TRAINING Pallas kernel
    (ops/pallas_kernels/fused_attn_block_train.py): in-kernel dropouts +
    fused backward. Returns None — falling back to the unfused modules —
    off TPU, at unsupported shapes (the 1024-d visual stream), or on
    non-float (quantized/calibrating) denses, which never occur in training.
    Caller gates on ``not deterministic``."""
    probes = attn_mod(hidden, None, True, params_only=True)
    out_probe = out_mod(hidden, params_only=True, with_ln=True)
    if out_probe is None or any(p is None for p in probes):
        return None
    (pq, pk, pv), (po, ln_scale, ln_bias) = probes, out_probe
    if po is None:
        return None
    if {pq[0], pk[0], pv[0], po[0]} != {"float"}:
        return None
    b, s, _ = hidden.shape
    key_bias = (
        bias.reshape(b, s).astype(jnp.float32)
        if bias is not None else jnp.zeros((b, s), jnp.float32)
    )
    from multimodal_classification_tpu.ops.pallas_kernels import (
        maybe_fused_attn_block_train,
    )

    thunk = maybe_fused_attn_block_train(
        hidden, key_bias, pq[1], pq[2], pk[1], pk[2], pv[1], pv[2],
        po[1], po[2], ln_scale, ln_bias, num_heads,
        rate_attn, rate_hidden, rng,
    )
    return thunk() if thunk is not None else None


def _try_fused_attn_block(attn_mod: "SelfAttention", out_mod: "ResidualOutput",
                          hidden, bias, num_heads: int):
    """Dispatch the whole attention sub-block (q/k/v/out projections +
    masked attention + residual LayerNorm) to one Pallas kernel
    (ops/pallas_kernels/fused_attn_block.py). Returns None — falling back to
    the unfused modules — off TPU, at unsupported shapes, under calibration,
    for static-calibrated int8 layers, or when the four denses took mixed
    quantization paths. Eval only (caller gates on deterministic)."""
    probes = attn_mod(hidden, None, True, params_only=True)
    out_probe = out_mod(hidden, params_only=True, with_ln=True)
    if out_probe is None or any(p is None for p in probes):
        return None
    (pq, pk, pv), (po, ln_scale, ln_bias) = probes, out_probe
    if po is None:
        return None
    tags = {pq[0], pk[0], pv[0], po[0]}
    if len(tags) != 1:
        return None
    b, s, _ = hidden.shape
    key_bias = (
        bias.reshape(b, s).astype(jnp.float32)
        if bias is not None else jnp.zeros((b, s), jnp.float32)
    )
    from multimodal_classification_tpu.ops.pallas_kernels import (
        maybe_fused_attn_block,
        maybe_fused_attn_block_int8,
    )

    if tags == {"float"}:
        thunk = maybe_fused_attn_block(
            hidden, key_bias, pq[1], pq[2], pk[1], pk[2], pv[1], pv[2],
            po[1], po[2], ln_scale, ln_bias, num_heads,
        )
    else:
        thunk = maybe_fused_attn_block_int8(
            hidden, key_bias,
            pq[1], pq[2], pq[3], pk[1], pk[2], pk[3], pv[1], pv[2], pv[3],
            po[1], po[2], po[3], ln_scale, ln_bias, num_heads,
        )
    return thunk() if thunk is not None else None


class TextEmbeddings(nn.Module):
    """BERT word + position + token-type embeddings
    (the reference takes these from HF BertModel — vilbert_facebook_arch.py:494-505;
    implemented natively here, loadable from a converted BERT checkpoint)."""

    vocab_size: int
    hidden_size: int
    max_position_embeddings: int
    type_vocab_size: int
    dropout_rate: float
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids, token_type_ids, deterministic: bool):
        emb = nn.Embed(
            self.vocab_size, self.hidden_size, param_dtype=jnp.float32,
            embedding_init=DEFAULT_INIT, name="word_embeddings",
        )(input_ids)
        seq = input_ids.shape[-1]
        pos_ids = jnp.arange(seq)[None, :]
        pos = nn.Embed(
            self.max_position_embeddings, self.hidden_size, param_dtype=jnp.float32,
            embedding_init=DEFAULT_INIT, name="position_embeddings",
        )(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        typ = nn.Embed(
            self.type_vocab_size, self.hidden_size, param_dtype=jnp.float32,
            embedding_init=DEFAULT_INIT, name="token_type_embeddings",
        )(token_type_ids)
        h = make_layernorm("LayerNorm")(emb + pos + typ)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return h.astype(self.dtype)


class VisualEmbeddings(nn.Module):
    """Region features [B,N,F] + spatial [B,N,5] → visual token embeddings.

    FB-arch form (use_position_embeddings=False): LN(img_proj + loc_proj)
    (reference: vilbert_facebook_arch.py:79-104). Core form adds a learned
    per-region position embedding (vilbert_core.py:419-480)."""

    v_hidden_size: int
    dropout_rate: float
    use_position_embeddings: bool = False
    max_regions: int = 100
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features, spatial, deterministic: bool):
        # The 2048→1024 image projection follows the model compute dtype: an
        # f32×f32 dot runs at ~1/8 the MXU's bf16 rate on TPU, and the HLO
        # roofline attribution showed it as the single most expensive eval op
        # (~1 ms at batch 64) when pinned to f32. bf16 operands still
        # accumulate in f32 inside the MXU; the result is summed and
        # LayerNormed in f32 below. The spatial projection (K=5, negligible
        # FLOPs, precision-sensitive box coordinates) stays f32.
        img = make_dense(self.v_hidden_size, self.dtype, "image_embeddings")(
            features.astype(self.dtype)
        )
        loc = make_dense(self.v_hidden_size, jnp.float32, "image_location_embeddings")(
            spatial.astype(jnp.float32)
        )
        h = img.astype(jnp.float32) + loc
        if self.use_position_embeddings:
            n = features.shape[-2]
            pos_ids = jnp.arange(n)[None, :]
            h = h + nn.Embed(
                self.max_regions, self.v_hidden_size, param_dtype=jnp.float32,
                embedding_init=DEFAULT_INIT, name="position_embeddings",
            )(pos_ids)
        h = make_layernorm("LayerNorm")(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return h.astype(self.dtype)


class Pooler(nn.Module):
    """tanh(W·x) over the first token (reference: BertPooler,
    vilbert_facebook_arch.py:397-408)."""

    output_size: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, first_token):
        return jnp.tanh(make_dense(self.output_size, self.dtype, "dense")(first_token))
