"""Two-stream ViLBERT with cross-modal co-attention (Flax).

One implementation covers both reference architectures via ViLBERTConfig:

- **Facebook-exact asymmetric arch** (the one behind every headline number;
  reference: models/vilbert_facebook_arch.py): text 12×768/12h, visual
  6×1024/8h, co-attention in a shared 1024-d bi-space (`BiAttention`: the two
  directions share the per-stream K/V projections) applied after text layers
  (1,3,5,7,9,11); first-token poolers; concat → MLP head.
- **Core symmetric variant** (reference: models/vilbert_core.py): both streams
  768-d, per-direction unshared cross-attention (`BertConnectionLayer`),
  learned visual position embeddings, [CLS]+mean pooling
  (select with ``config.pooling="cls_mean"`` / ``co_attention_shared=False``).

Encoder interleave (identical in both references): for each text layer t,
run the text block; if t is a co-attention site, run one visual block then the
cross-modal block (vilbert_facebook_arch.py:459-481, vilbert_core.py:385-416).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_classification_tpu.config import ViLBERTConfig
from multimodal_classification_tpu.models.layers import (
    CrossAttention,
    Intermediate,
    Pooler,
    ResidualOutput,
    TextEmbeddings,
    TransformerLayer,
    VisualEmbeddings,
    apply_ffn,
    make_dense,
)
from multimodal_classification_tpu.ops.attention import (
    NEG_INF,
    bi_attention_core,
    mask_to_bias,
    merge_heads,
    split_heads,
)
from multimodal_classification_tpu.registry import register_model


def _ffn_train_rngs(mod: nn.Module, cfg: ViLBERTConfig, deterministic: bool):
    """Two dropout rngs for the training-fused FFN blocks (one per stream —
    the kernel hashes (row, col) coordinates, so two streams sharing a seed
    would share mask bits), or (None, None) when the path is off."""
    if deterministic or not cfg.fused_ffn_training or not mod.has_rng("dropout"):
        return None, None
    return mod.make_rng("dropout"), mod.make_rng("dropout")


class BiAttentionBlock(nn.Module):
    """Shared-projection bidirectional cross-attention + per-stream FFN —
    Facebook's `c_layer` (reference: vilbert_facebook_arch.py:222-394
    BiAttention/BiOutput/CoAttentionLayer).

    Projections: query1/key1/value1 lift the visual stream and query2/key2/
    value2 the text stream into the bi-space; the v→t direction uses
    (query1, key2, value2), the t→v direction (query2, key1, value1) — the
    K/V projections are shared between directions. Output: per-stream
    projection back + dropout + LayerNorm residual, then per-stream FFN.
    """

    cfg: ViLBERTConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, v_hidden, t_hidden, v_bias, t_bias, deterministic: bool):
        cfg = self.cfg
        bi = cfg.bi_hidden_size
        heads = cfg.bi_num_attention_heads

        d_q1 = make_dense(bi, self.dtype, "query1")
        d_k1 = make_dense(bi, self.dtype, "key1")
        d_v1 = make_dense(bi, self.dtype, "value1")
        d_q2 = make_dense(bi, self.dtype, "query2")
        d_k2 = make_dense(bi, self.dtype, "key2")
        d_v2 = make_dense(bi, self.dtype, "value2")
        out_v = ResidualOutput(
            cfg.v_hidden_size, cfg.hidden_dropout_prob, self.dtype,
            name="v_output_attn")
        out_t = ResidualOutput(
            cfg.hidden_size, cfg.hidden_dropout_prob, self.dtype,
            name="t_output_attn")

        if cfg.fused_co_attn and deterministic:
            # whole-direction Pallas kernels (q + cross k/v + attention +
            # out-proj + residual LN per direction); falls back below when
            # the dispatch refuses (off-TPU, shapes, mixed quantization)
            fused = _try_fused_co_block(
                (d_q1, d_k1, d_v1), (d_q2, d_k2, d_v2), out_v, out_t,
                v_hidden, t_hidden, v_bias, t_bias, heads,
                mode=cfg.fused_co_attn,
                text_layers_fused=bool(cfg.fused_text_layer),
            )
            if fused is not None:
                v_attn, t_attn = fused
                fused_ffn = cfg.fused_ffn and deterministic
                rng_v, rng_t = _ffn_train_rngs(self, cfg, deterministic)
                v_out = apply_ffn(
                    Intermediate(cfg.v_intermediate_size, self.dtype,
                                 name="v_intermediate"),
                    ResidualOutput(cfg.v_hidden_size, cfg.v_hidden_dropout_prob,
                                   self.dtype, name="v_output"),
                    v_attn, deterministic, fused_ffn, train_rng=rng_v,
                )
                t_out = apply_ffn(
                    Intermediate(cfg.intermediate_size, self.dtype,
                                 name="t_intermediate"),
                    ResidualOutput(cfg.hidden_size, cfg.hidden_dropout_prob,
                                   self.dtype, name="t_output"),
                    t_attn, deterministic, fused_ffn, train_rng=rng_t,
                )
                return v_out, t_out

        q1 = d_q1(v_hidden)
        k1 = d_k1(v_hidden)
        v1 = d_v1(v_hidden)
        q2 = d_q2(t_hidden)
        k2 = d_k2(t_hidden)
        v2 = d_v2(t_hidden)

        rate = 0.0 if deterministic else cfg.attention_probs_dropout_prob
        rngs = None
        if rate > 0.0:
            rngs = (self.make_rng("dropout"), self.make_rng("dropout"))
        v_ctx, t_ctx = bi_attention_core(
            split_heads(q1, heads), (split_heads(k2, heads), split_heads(v2, heads)),
            split_heads(q2, heads), (split_heads(k1, heads), split_heads(v1, heads)),
            t_bias, v_bias,
            dropout_rate=rate, dropout_rngs=rngs,
            impl="auto" if cfg.use_pallas_attention
            and (deterministic or cfg.pallas_attention_training) else "xla",
        )
        v_ctx = merge_heads(v_ctx)
        t_ctx = merge_heads(t_ctx)

        # BiOutput: project back per stream + residual (the reference also
        # defines q_dense1/q_dense2 here but never applies them in forward —
        # vilbert_facebook_arch.py:324-338; we do not create them). Note the
        # reference's BiOutput uses hidden_dropout_prob for BOTH streams
        # (one shared nn.Dropout, :318-338).
        v_attn = out_v(v_ctx, v_hidden, deterministic)
        t_attn = out_t(t_ctx, t_hidden, deterministic)

        fused = cfg.fused_ffn and deterministic
        rng_v, rng_t = _ffn_train_rngs(self, cfg, deterministic)
        v_out = apply_ffn(
            Intermediate(cfg.v_intermediate_size, self.dtype, name="v_intermediate"),
            ResidualOutput(cfg.v_hidden_size, cfg.v_hidden_dropout_prob, self.dtype,
                           name="v_output"),
            v_attn, deterministic, fused, train_rng=rng_v,
        )
        t_out = apply_ffn(
            Intermediate(cfg.intermediate_size, self.dtype, name="t_intermediate"),
            ResidualOutput(cfg.hidden_size, cfg.hidden_dropout_prob, self.dtype,
                           name="t_output"),
            t_attn, deterministic, fused, train_rng=rng_t,
        )
        return v_out, t_out


def _try_fused_co_block(v_denses, t_denses, out_v, out_t,
                        v_hidden, t_hidden, v_bias, t_bias, num_heads: int,
                        mode="auto", text_layers_fused=False):
    """Dispatch both co-attention directions to the fused Pallas kernels
    (ops/pallas_kernels/fused_co_block.py). Returns (v_attn, t_attn) or
    None — falling back to the unfused modules — off TPU, at unsupported
    shapes, under calibration, when the denses took mixed quantization
    paths, or when ``mode="auto"``'s measured policy refuses. The policy
    (re-validated round 4, 2 reps × batches 16/64/112 at seq 32 —
    parameters.yml tuning log): int8 WITH whole-text-layer fusion wins at
    EVERY batch (lyr8 3974/3836 vs lyr8nc 3431/3334 @16; +2-3% @64/112) —
    once the text layers are single kernels, the unfused co-attention's
    many small XLA ops dominate the step; int8 WITHOUT text-layer fusion
    still loses under batch 32 (coa8 3437 vs blk8 3931 @16); bf16 loses or
    ties everywhere. Eval only (caller gates on deterministic)."""
    if (mode == "auto" and v_hidden.shape[0] < 32
            and not text_layers_fused):
        return None
    pq1, pk1, pv1 = (d(v_hidden, return_params=True) for d in v_denses)
    pq2, pk2, pv2 = (d(t_hidden, return_params=True) for d in t_denses)
    probes = (pq1, pk1, pv1, pq2, pk2, pv2)
    if any(p is None for p in probes):
        return None
    # the output denses map the BI space back to each stream — probe them
    # with a bi-shaped dummy (param creation keys off the input's last dim;
    # probing with the stream hidden would create a wrong-shaped kernel
    # whenever bi != hidden, i.e. at every non-tiny config)
    bi = probes[0][1].shape[1]
    ctx_dummy = jnp.zeros((1, 1, bi), v_hidden.dtype)
    ov = out_v(ctx_dummy, params_only=True, with_ln=True)
    ot = out_t(ctx_dummy, params_only=True, with_ln=True)
    if ov is None or ot is None:
        return None
    (pov, lnv_scale, lnv_bias), (pot, lnt_scale, lnt_bias) = ov, ot
    if pov is None or pot is None:
        return None
    tags = {p[0] for p in probes} | {pov[0], pot[0]}
    if len(tags) != 1:
        return None
    if mode == "auto" and tags != {"int8"}:
        return None
    bv, st = v_hidden.shape[0], t_hidden.shape[1]
    sv = v_hidden.shape[1]
    t_key_bias = (
        t_bias.reshape(bv, st).astype(jnp.float32)
        if t_bias is not None else jnp.zeros((bv, st), jnp.float32)
    )
    v_key_bias = (
        v_bias.reshape(bv, sv).astype(jnp.float32)
        if v_bias is not None else jnp.zeros((bv, sv), jnp.float32)
    )
    from multimodal_classification_tpu.ops.pallas_kernels import (
        maybe_fused_co_dir,
        maybe_fused_co_dir_int8,
    )

    if tags == {"float"}:
        # v→t direction: visual queries (q1) over text keys/values (k2, v2)
        thunk_v = maybe_fused_co_dir(
            v_hidden, t_hidden, t_key_bias,
            pq1[1], pq1[2], pk2[1], pk2[2], pv2[1], pv2[2],
            pov[1], pov[2], lnv_scale, lnv_bias, num_heads,
        )
        thunk_t = maybe_fused_co_dir(
            t_hidden, v_hidden, v_key_bias,
            pq2[1], pq2[2], pk1[1], pk1[2], pv1[1], pv1[2],
            pot[1], pot[2], lnt_scale, lnt_bias, num_heads,
        )
    else:
        thunk_v = maybe_fused_co_dir_int8(
            v_hidden, t_hidden, t_key_bias,
            pq1[1], pq1[2], pq1[3], pk2[1], pk2[2], pk2[3],
            pv2[1], pv2[2], pv2[3], pov[1], pov[2], pov[3],
            lnv_scale, lnv_bias, num_heads,
        )
        thunk_t = maybe_fused_co_dir_int8(
            t_hidden, v_hidden, v_key_bias,
            pq2[1], pq2[2], pq2[3], pk1[1], pk1[2], pk1[3],
            pv1[1], pv1[2], pv1[3], pot[1], pot[2], pot[3],
            lnt_scale, lnt_bias, num_heads,
        )
    if thunk_v is None or thunk_t is None:
        return None
    return thunk_v(), thunk_t()


class ConnectionBlock(nn.Module):
    """Unshared per-direction cross-attention + per-stream FFN — the core
    variant's `BertConnectionLayer` (reference: vilbert_core.py:271-330).
    Requires symmetric stream dims (hidden_size == v_hidden_size)."""

    cfg: ViLBERTConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, v_hidden, t_hidden, v_bias, t_bias, deterministic: bool):
        cfg = self.cfg
        v_ctx = CrossAttention(
            cfg.v_hidden_size, cfg.v_num_attention_heads,
            cfg.v_attention_probs_dropout_prob, self.dtype, name="biattention_v",
        )(v_hidden, t_hidden, t_bias, deterministic)
        v_attn = ResidualOutput(
            cfg.v_hidden_size, cfg.v_hidden_dropout_prob, self.dtype, name="v_output_attn"
        )(v_ctx, v_hidden, deterministic)
        t_ctx = CrossAttention(
            cfg.hidden_size, cfg.num_attention_heads,
            cfg.attention_probs_dropout_prob, self.dtype, name="biattention_t",
        )(t_hidden, v_hidden, v_bias, deterministic)
        t_attn = ResidualOutput(
            cfg.hidden_size, cfg.hidden_dropout_prob, self.dtype, name="t_output_attn"
        )(t_ctx, t_hidden, deterministic)

        fused = cfg.fused_ffn and deterministic
        rng_v, rng_t = _ffn_train_rngs(self, cfg, deterministic)
        v_out = apply_ffn(
            Intermediate(cfg.v_intermediate_size, self.dtype, name="intermediate_v"),
            ResidualOutput(cfg.v_hidden_size, cfg.v_hidden_dropout_prob, self.dtype,
                           name="output_v"),
            v_attn, deterministic, fused, train_rng=rng_v,
        )
        t_out = apply_ffn(
            Intermediate(cfg.intermediate_size, self.dtype, name="intermediate_t"),
            ResidualOutput(cfg.hidden_size, cfg.hidden_dropout_prob, self.dtype,
                           name="output_t"),
            t_attn, deterministic, fused, train_rng=rng_t,
        )
        return v_out, t_out


def stackable_layout(cfg: ViLBERTConfig) -> bool:
    """True when the encoder interleave is the regular superlayer repeat
    ``[text×2 → visual → co-attention] × v_num_hidden_layers`` — the layout
    of the FB (12/6, sites 1,3,..,11), core, and tiny configs — which is the
    precondition for scanning it with stacked params."""
    return (
        cfg.num_hidden_layers == 2 * cfg.v_num_hidden_layers
        and tuple(cfg.co_attention_text_layers)
        == tuple(range(1, cfg.num_hidden_layers, 2))
    )


class SuperLayer(nn.Module):
    """One repeat of the regular encoder interleave (two text layers, one
    visual layer, one cross-modal block), shaped as an ``nn.scan`` body:
    params get a leading [v_num_hidden_layers] axis and the whole encoder
    becomes one compiled loop instead of 24 inlined blocks. Semantically
    identical to the unrolled path (parity-tested); motivated by the per-op
    profile of the train step (see config.stacked_encoder)."""

    cfg: ViLBERTConfig
    dtype: jnp.dtype
    impl: str
    deterministic: bool

    @nn.compact
    def __call__(self, carry, _):
        cfg, det = self.cfg, self.deterministic
        t_hidden, v_hidden, t_bias, v_bias = carry
        fused = cfg.fused_ffn and det

        fused_block = cfg.fused_attn_block and det
        fused_layer = cfg.fused_text_layer and det

        def text_layer(name: str) -> TransformerLayer:
            return TransformerLayer(
                cfg.hidden_size, cfg.num_attention_heads, cfg.intermediate_size,
                cfg.hidden_dropout_prob, cfg.attention_probs_dropout_prob,
                self.dtype, self.impl, fused, fused_block, fused_layer,
                fused_ffn_train=cfg.fused_ffn_training,
                fused_block_train=cfg.fused_attn_block_training, name=name,
            )

        t_hidden = text_layer("t_a")(t_hidden, t_bias, det)
        t_hidden = text_layer("t_b")(t_hidden, t_bias, det)
        v_hidden = TransformerLayer(
            cfg.v_hidden_size, cfg.v_num_attention_heads, cfg.v_intermediate_size,
            cfg.v_hidden_dropout_prob, cfg.v_attention_probs_dropout_prob,
            self.dtype, self.impl, fused, fused_block, fused_layer,
            fused_ffn_train=cfg.fused_ffn_training,
            fused_block_train=cfg.fused_attn_block_training, name="v",
        )(v_hidden, v_bias, det)
        co_block = BiAttentionBlock if cfg.pooling == "cls" else ConnectionBlock
        v_hidden, t_hidden = co_block(cfg, self.dtype, name="c")(
            v_hidden, t_hidden, v_bias, t_bias, det
        )
        return (t_hidden, v_hidden, t_bias, v_bias), None


class ViLBERTEncoder(nn.Module):
    """Interleaved two-stream encoder (see module docstring)."""

    cfg: ViLBERTConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, t_hidden, v_hidden, t_bias, v_bias, deterministic: bool):
        cfg = self.cfg
        co_sites = set(cfg.co_attention_text_layers)
        # training defaults to XLA (measured faster at these shapes — see
        # config.pallas_attention_training); eval gets the fused kernels
        use_pallas = cfg.use_pallas_attention and (
            deterministic or cfg.pallas_attention_training
        )
        impl = "auto" if use_pallas else "xla"

        if cfg.stacked_encoder and stackable_layout(cfg):
            body = SuperLayer
            if cfg.remat:
                body = nn.remat(body)
            stack = nn.scan(
                body,
                variable_axes={"params": 0, "quant": 0, "calib": 0},
                split_rngs={"params": True, "dropout": True},
                length=cfg.v_num_hidden_layers,
            )(cfg, self.dtype, impl, deterministic, name="stack")
            (t_hidden, v_hidden, _, _), _ = stack(
                (t_hidden, v_hidden, t_bias, v_bias), None
            )
            return t_hidden, v_hidden

        text_layer = TransformerLayer
        visual_layer = TransformerLayer
        co_block = BiAttentionBlock if cfg.pooling == "cls" else ConnectionBlock
        # core variant (cls_mean pooling) uses unshared connection layers
        if cfg.remat:
            # static_argnums index into (module, hidden, bias, deterministic)
            text_layer = nn.remat(text_layer, static_argnums=(3,))
            visual_layer = nn.remat(visual_layer, static_argnums=(3,))

        fused_block = cfg.fused_attn_block and deterministic
        fused_layer = cfg.fused_text_layer and deterministic
        v_idx = 0
        for t_idx in range(cfg.num_hidden_layers):
            t_hidden = text_layer(
                cfg.hidden_size, cfg.num_attention_heads, cfg.intermediate_size,
                cfg.hidden_dropout_prob, cfg.attention_probs_dropout_prob,
                self.dtype, impl, cfg.fused_ffn and deterministic, fused_block,
                fused_layer, fused_ffn_train=cfg.fused_ffn_training,
 fused_block_train=cfg.fused_attn_block_training,
                name=f"layer_{t_idx}",
            )(t_hidden, t_bias, deterministic)
            if t_idx in co_sites and v_idx < cfg.v_num_hidden_layers:
                v_hidden = visual_layer(
                    cfg.v_hidden_size, cfg.v_num_attention_heads, cfg.v_intermediate_size,
                    cfg.v_hidden_dropout_prob, cfg.v_attention_probs_dropout_prob,
                    self.dtype, impl, cfg.fused_ffn and deterministic, fused_block,
                    fused_layer, fused_ffn_train=cfg.fused_ffn_training,
 fused_block_train=cfg.fused_attn_block_training,
                    name=f"v_layer_{v_idx}",
                )(v_hidden, v_bias, deterministic)
                v_hidden, t_hidden = co_block(cfg, self.dtype, name=f"c_layer_{v_idx}")(
                    v_hidden, t_hidden, v_bias, t_bias, deterministic
                )
                v_idx += 1
        return t_hidden, v_hidden


class ViLBERTModel(nn.Module):
    """Backbone: embeddings → interleaved encoder → poolers
    (reference: vilbert_facebook_arch.py:484-551 / vilbert_core.py:483-591)."""

    cfg: ViLBERTConfig

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        visual_features=None,
        visual_attention_mask=None,
        spatial_locations=None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)

        t_hidden = TextEmbeddings(
            cfg.vocab_size, cfg.hidden_size, cfg.max_position_embeddings,
            cfg.type_vocab_size, cfg.hidden_dropout_prob, dtype, name="embeddings",
        )(input_ids, token_type_ids, deterministic)
        v_hidden = VisualEmbeddings(
            cfg.v_hidden_size, cfg.v_hidden_dropout_prob,
            cfg.v_use_position_embeddings, dtype=dtype, name="v_embeddings",
        )(visual_features, spatial_locations, deterministic)

        t_bias = mask_to_bias(attention_mask)
        v_bias = mask_to_bias(visual_attention_mask)

        # Pad the visual stream ONCE to the sublane tile for the whole
        # encoder instead of letting every fused kernel pad 100 -> 112 and
        # slice back per call: the batch-64 XPlane profile showed ~0.5 ms/
        # step (5%) of pad/reshape/slice glue around the Pallas calls.
        # Padded rows ride a NEG_INF key bias, so no real row attends to
        # them (identical masked-attention function); their own outputs are
        # garbage and are sliced off after the encoder. Eval-only, TPU-only,
        # and only when a per-item-padding kernel is active.
        nr = v_hidden.shape[1]
        padded = False
        if (cfg.visual_stream_padding and deterministic
                and bool(cfg.fused_attn_block or cfg.fused_co_attn)):
            from multimodal_classification_tpu.ops.pallas_kernels import (
                on_tpu,
            )

            tile = -(-nr // 16) * 16
            if tile != nr and on_tpu():
                pad = tile - nr
                padded = True
                v_hidden = jnp.pad(v_hidden, ((0, 0), (0, pad), (0, 0)))
                if v_bias is None:
                    b = v_hidden.shape[0]
                    v_bias = jnp.concatenate(
                        [jnp.zeros((b, 1, 1, nr), jnp.float32),
                         jnp.full((b, 1, 1, pad), NEG_INF, jnp.float32)],
                        axis=-1)
                else:
                    v_bias = jnp.pad(
                        v_bias, ((0, 0), (0, 0), (0, 0), (0, pad)),
                        constant_values=NEG_INF)

        t_hidden, v_hidden = ViLBERTEncoder(cfg, dtype, name="encoder")(
            t_hidden, v_hidden, t_bias, v_bias, deterministic
        )
        if padded:
            v_hidden = v_hidden[:, :nr]

        t_pooled = Pooler(cfg.bi_hidden_size, dtype, name="t_pooler")(t_hidden[:, 0])
        if cfg.pooling == "cls_mean":
            v_first = jnp.mean(v_hidden, axis=1)
            v_pool_size = cfg.v_hidden_size
        else:
            v_first = v_hidden[:, 0]
            v_pool_size = cfg.v_hidden_size
        v_pooled = Pooler(v_pool_size, dtype, name="v_pooler")(v_first)
        return {
            "text_output": t_hidden,
            "visual_output": v_hidden,
            "text_pooled": t_pooled,
            "visual_pooled": v_pooled,
        }


class ViLBERTForClassification(nn.Module):
    """ViLBERT + MLP classification head.

    Head: dropout → Linear(bi+v_hidden → classifier_hidden) → ReLU → dropout
    → Linear(→ num_labels) (reference: vilbert_facebook_arch.py:570-578,
    vilbert_core.py:611-618). Returns logits; losses live in
    ``training.losses`` (pure functions) rather than inside the model.
    """

    cfg: ViLBERTConfig

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        visual_features=None,
        visual_attention_mask=None,
        spatial_locations=None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        out = ViLBERTModel(cfg, name="bert")(
            input_ids, attention_mask, token_type_ids,
            visual_features, visual_attention_mask, spatial_locations,
            deterministic,
        )
        pooled = jnp.concatenate([out["text_pooled"], out["visual_pooled"]], axis=-1)
        h = nn.Dropout(cfg.classifier_dropout)(pooled, deterministic=deterministic)
        h = make_dense(cfg.classifier_hidden_size, dtype, "classifier_dense")(h)
        h = nn.relu(h)
        h = nn.Dropout(cfg.classifier_dropout)(h, deterministic=deterministic)
        logits = make_dense(cfg.num_labels, jnp.float32, "classifier_out")(h)
        return {"logits": logits.astype(jnp.float32), "pooled_output": pooled, **out}


# ---------------------------------------------------------------------------
# Registry factories (names preserved from the reference registry,
# models/__init__.py:34-59 / nodes.py:212-348)
# ---------------------------------------------------------------------------


@register_model("vilbert_facebook")
def _make_facebook(config: Optional[ViLBERTConfig] = None, **overrides) -> ViLBERTForClassification:
    from multimodal_classification_tpu.config import facebook_vilbert_config

    cfg = config or facebook_vilbert_config(**overrides)
    return ViLBERTForClassification(cfg)


@register_model("vilbert_hf")
def _make_core(config: Optional[ViLBERTConfig] = None, **overrides) -> ViLBERTForClassification:
    from multimodal_classification_tpu.config import core_vilbert_config

    cfg = config or core_vilbert_config(**overrides)
    return ViLBERTForClassification(cfg)


def init_params(model: ViLBERTForClassification, rng: jax.Array, batch: Dict[str, Any]):
    return model.init({"params": rng}, **batch, deterministic=True)["params"]


def dummy_batch(
    cfg: ViLBERTConfig, batch_size: int = 2, seq_len: int = 16, num_regions: int = 8
) -> Dict[str, jnp.ndarray]:
    """Shape-correct all-ones batch for init/compile checks."""
    return {
        "input_ids": jnp.ones((batch_size, seq_len), jnp.int32),
        "attention_mask": jnp.ones((batch_size, seq_len), jnp.float32),
        "token_type_ids": jnp.zeros((batch_size, seq_len), jnp.int32),
        "visual_features": jnp.ones((batch_size, num_regions, cfg.v_feature_size), jnp.float32),
        "visual_attention_mask": jnp.ones((batch_size, num_regions), jnp.float32),
        "spatial_locations": jnp.ones((batch_size, num_regions, cfg.v_loc_size), jnp.float32),
    }
