"""TPU-native BLIP image captioner (Flax) — caption enrichment without torch.

The reference's CES technique appends BLIP captions to the meme text
(reference: pipelines/data_processing/augmentation.py:24-106 ImageCaptioner,
Salesforce/blip-image-captioning-base via transformers). Here the captioner
is implemented natively: ViT-B/16 vision tower + BERT-style causal decoder
with cross-attention, greedy decoding as a single jitted ``lax.scan`` over
positions (static shapes — no dynamic stopping; finished rows emit pad).

Weight conversion from the HF checkpoint layout: :func:`convert_hf_blip`
(parity-tested against a randomly-initialised ``BlipForConditionalGeneration``
on CPU — logits and greedy captions match, so the real checkpoint loads
correctly once the network gate opens).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_classification_tpu.models.layers import (
    CrossAttention,
    Intermediate,
    ResidualOutput,
    SelfAttention,
    make_dense,
    make_layernorm,
)
from multimodal_classification_tpu.ops.attention import NEG_INF

# Salesforce/blip-image-captioning-base token ids
BLIP_BOS = 30522  # [DEC]
BLIP_EOS = 102    # [SEP]
BLIP_PAD = 0


@dataclasses.dataclass(frozen=True)
class BlipConfig:
    # vision (ViT-B/16 @ 224)
    image_size: int = 224
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    vision_mlp: int = 3072
    vision_eps: float = 1e-5
    # text decoder (BERT-base-like, vocab 30524)
    vocab_size: int = 30524
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    bos_token_id: int = BLIP_BOS
    eos_token_id: int = BLIP_EOS
    pad_token_id: int = BLIP_PAD
    dtype: str = "bfloat16"


def tiny_blip_config(**overrides) -> BlipConfig:
    base = dict(
        image_size=32, patch_size=16, vision_width=32, vision_layers=2,
        vision_heads=2, vision_mlp=64, vocab_size=80, hidden_size=32,
        num_layers=2, num_heads=2, intermediate_size=64,
        max_position_embeddings=24, dtype="float32",
    )
    base.update(overrides)
    return BlipConfig(**base)


class BlipVisionBlock(nn.Module):
    """Pre-norm ViT block, HF BlipEncoderLayer semantics (fused qkv with
    bias, erf-GELU MLP, LN eps 1e-5)."""

    width: int
    heads: int
    mlp: int
    eps: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = self.width // self.heads

        def heads_of(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", heads_of(q), heads_of(k),
                            preferred_element_type=jnp.float32) / np.sqrt(d)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(self.dtype), heads_of(v))
        b, _, s, _ = ctx.shape
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, self.width)
        x = x + nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                         name="projection")(ctx)
        h2 = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        m = nn.Dense(self.mlp, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(h2)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(m)
        return x + m


class BlipVisionTower(nn.Module):
    """HF BlipVisionModel: patch conv + cls + learned positions → blocks →
    post-LN. Returns [B, 1+N, W]."""

    cfg: BlipConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        p = cfg.patch_size
        x = nn.Conv(cfg.vision_width, (p, p), strides=(p, p), dtype=dt,
                    param_dtype=jnp.float32, name="patch_embed")(images.astype(dt))
        b, gh, gw, w = x.shape
        tokens = x.reshape(b, gh * gw, w)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, w), jnp.float32)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dt), (b, 1, w)), tokens], axis=1
        )
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gh * gw + 1, w), jnp.float32)
        tokens = tokens + pos.astype(dt)
        for i in range(cfg.vision_layers):
            tokens = BlipVisionBlock(
                cfg.vision_width, cfg.vision_heads, cfg.vision_mlp,
                cfg.vision_eps, dt, name=f"block_{i}",
            )(tokens)
        out = nn.LayerNorm(epsilon=cfg.vision_eps, dtype=jnp.float32,
                           param_dtype=jnp.float32, name="post_norm")(tokens)
        return out.astype(dt)


class BlipDecoderLayer(nn.Module):
    """Post-LN BERT decoder layer: causal self-attn → cross-attn over the
    vision tokens → FFN (HF BlipTextLayer with is_decoder=True)."""

    cfg: BlipConfig

    @nn.compact
    def __call__(self, hidden, enc_tokens, causal_bias, deterministic: bool = True):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        ctx = SelfAttention(cfg.hidden_size, cfg.num_heads, 0.0, dt,
                            attention_impl="xla", name="attention")(
            hidden, causal_bias, deterministic)
        hidden = ResidualOutput(cfg.hidden_size, 0.0, dt, name="attention_output")(
            ctx, hidden, deterministic)
        xctx = CrossAttention(cfg.hidden_size, cfg.num_heads, 0.0, dt,
                              attention_impl="xla", name="crossattention")(
            hidden, enc_tokens, None, deterministic)
        hidden = ResidualOutput(cfg.hidden_size, 0.0, dt, name="cross_output")(
            xctx, hidden, deterministic)
        inter = Intermediate(cfg.intermediate_size, dt, name="intermediate")(hidden)
        return ResidualOutput(cfg.hidden_size, 0.0, dt, name="output")(
            inter, hidden, deterministic)


class BlipTextDecoder(nn.Module):
    """HF BlipTextLMHeadModel: embeddings → decoder layers → BERT LM head.
    Returns logits [B, L, vocab]."""

    cfg: BlipConfig

    @nn.compact
    def __call__(self, input_ids, enc_tokens, deterministic: bool = True):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        b, l = input_ids.shape
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, param_dtype=jnp.float32,
                        name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       param_dtype=jnp.float32, name="position_embeddings")(
            jnp.arange(l)[None, :])
        hidden = make_layernorm("emb_LayerNorm")(
            (word + pos).astype(jnp.float32)).astype(dt)

        causal = jnp.tril(jnp.ones((l, l), jnp.float32))
        causal_bias = ((1.0 - causal) * NEG_INF)[None, None, :, :]
        for i in range(cfg.num_layers):
            hidden = BlipDecoderLayer(cfg, name=f"layer_{i}")(
                hidden, enc_tokens, causal_bias, deterministic)

        h = make_dense(cfg.hidden_size, dt, "transform_dense")(hidden)
        h = nn.gelu(h, approximate=False)
        h = make_layernorm("transform_LayerNorm")(h.astype(jnp.float32)).astype(dt)
        logits = nn.Dense(cfg.vocab_size, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="lm_head")(h)
        return logits


class _CachedSelfAttention(nn.Module):
    """Single-token self-attention against an incrementally-filled KV cache.

    Declares the same "query"/"key"/"value" denses as ``SelfAttention`` so it
    binds the identical param paths (a second *view* of the same weights —
    flax ignores unread tree entries)."""

    hidden_size: int
    num_heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, hidden, kcache, vcache, pos):
        from multimodal_classification_tpu.ops.attention import (
            attention_core, merge_heads, split_heads)

        q = make_dense(self.hidden_size, self.dtype, "query")(hidden)   # [B,1,W]
        k = make_dense(self.hidden_size, self.dtype, "key")(hidden)
        v = make_dense(self.hidden_size, self.dtype, "value")(hidden)
        kcache = jax.lax.dynamic_update_slice(
            kcache, split_heads(k, self.num_heads).astype(kcache.dtype), (0, 0, pos, 0))
        vcache = jax.lax.dynamic_update_slice(
            vcache, split_heads(v, self.num_heads).astype(vcache.dtype), (0, 0, pos, 0))
        L = kcache.shape[2]
        bias = jnp.where(jnp.arange(L) <= pos, 0.0, NEG_INF)[None, None, None, :]
        ctx = attention_core(split_heads(q, self.num_heads), kcache, vcache,
                             bias, impl="xla")
        return merge_heads(ctx), kcache, vcache


class _CachedCrossQuery(nn.Module):
    """Cross-attention with precomputed K/V; binds only the "query" dense of
    the ``crossattention`` scope."""

    hidden_size: int
    num_heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, hidden, cross_k, cross_v):
        from multimodal_classification_tpu.ops.attention import (
            attention_core, merge_heads, split_heads)

        q = make_dense(self.hidden_size, self.dtype, "query")(hidden)
        ctx = attention_core(split_heads(q, self.num_heads), cross_k, cross_v,
                             None, impl="xla")
        return merge_heads(ctx)


class _CachedDecoderLayer(nn.Module):
    cfg: BlipConfig

    @nn.compact
    def __call__(self, hidden, kcache, vcache, pos, cross_k, cross_v):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        ctx, kcache, vcache = _CachedSelfAttention(
            cfg.hidden_size, cfg.num_heads, dt, name="attention")(
            hidden, kcache, vcache, pos)
        hidden = ResidualOutput(cfg.hidden_size, 0.0, dt, name="attention_output")(
            ctx, hidden, True)
        xctx = _CachedCrossQuery(cfg.hidden_size, cfg.num_heads, dt,
                                 name="crossattention")(hidden, cross_k, cross_v)
        hidden = ResidualOutput(cfg.hidden_size, 0.0, dt, name="cross_output")(
            xctx, hidden, True)
        inter = Intermediate(cfg.intermediate_size, dt, name="intermediate")(hidden)
        return ResidualOutput(cfg.hidden_size, 0.0, dt, name="output")(
            inter, hidden, True), kcache, vcache


class _CrossKVLayer(nn.Module):
    cfg: BlipConfig

    @nn.compact
    def __call__(self, enc):
        from multimodal_classification_tpu.ops.attention import split_heads

        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)

        class _KV(nn.Module):
            @nn.compact
            def __call__(self_inner, enc):
                k = make_dense(cfg.hidden_size, dt, "key")(enc)
                v = make_dense(cfg.hidden_size, dt, "value")(enc)
                return (split_heads(k, cfg.num_heads), split_heads(v, cfg.num_heads))

        return _KV(name="crossattention")(enc)


class BlipCrossKV(nn.Module):
    """Precompute every layer's cross-attention K/V over the vision tokens
    (done once per image instead of once per decode step)."""

    cfg: BlipConfig

    @nn.compact
    def __call__(self, enc):
        ks, vs = [], []
        for i in range(self.cfg.num_layers):
            k, v = _CrossKVLayer(self.cfg, name=f"layer_{i}")(enc)
            ks.append(k)
            vs.append(v)
        return jnp.stack(ks), jnp.stack(vs)   # [nl, B, H, N, D]


class BlipCachedStep(nn.Module):
    """One decode step: token at ``pos`` → logits for ``pos+1``; self-attn
    K/V caches are updated in place (functionally)."""

    cfg: BlipConfig

    @nn.compact
    def __call__(self, token, pos, kcaches, vcaches, cross_ks, cross_vs):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, param_dtype=jnp.float32,
                        name="word_embeddings")(token[:, None])
        pos_emb = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                           param_dtype=jnp.float32, name="position_embeddings")(
            jnp.full((1, 1), pos, jnp.int32))
        hidden = make_layernorm("emb_LayerNorm")(
            (word + pos_emb).astype(jnp.float32)).astype(dt)

        new_k, new_v = [], []
        for i in range(cfg.num_layers):
            hidden, kc, vc = _CachedDecoderLayer(cfg, name=f"layer_{i}")(
                hidden, kcaches[i], vcaches[i], pos, cross_ks[i], cross_vs[i])
            new_k.append(kc)
            new_v.append(vc)

        h = make_dense(cfg.hidden_size, dt, "transform_dense")(hidden)
        h = nn.gelu(h, approximate=False)
        h = make_layernorm("transform_LayerNorm")(h.astype(jnp.float32)).astype(dt)
        logits = nn.Dense(cfg.vocab_size, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="lm_head")(h)
        return logits[:, 0, :], jnp.stack(new_k), jnp.stack(new_v)


class BlipForCaptioning:
    """Vision tower + causal decoder + jitted greedy decode."""

    def __init__(self, cfg: Optional[BlipConfig] = None):
        self.cfg = cfg or BlipConfig()
        self.vision = BlipVisionTower(self.cfg)
        self.decoder = BlipTextDecoder(self.cfg)
        self._cross_kv = BlipCrossKV(self.cfg)
        self._step = BlipCachedStep(self.cfg)
        self._generate = None
        self._generate_cached = None

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        r1, r2 = jax.random.split(rng)
        c = self.cfg
        dummy_img = jnp.zeros((1, c.image_size, c.image_size, 3), jnp.float32)
        vparams = self.vision.init(r1, dummy_img)["params"]
        n_tok = (c.image_size // c.patch_size) ** 2 + 1
        tparams = self.decoder.init(
            r2, jnp.zeros((1, 4), jnp.int32),
            jnp.zeros((1, n_tok, c.vision_width), jnp.float32),
        )["params"]
        return {"vision": vparams, "text": tparams}

    def encode(self, params, images: jnp.ndarray) -> jnp.ndarray:
        return self.vision.apply({"params": params["vision"]}, images)

    def logits(self, params, input_ids, enc_tokens) -> jnp.ndarray:
        return self.decoder.apply({"params": params["text"]}, input_ids, enc_tokens)

    def generate_greedy(self, params, images: jnp.ndarray,
                        max_length: int = 24) -> jnp.ndarray:
        """[B, H, W, 3] (normalised) → token ids [B, max_length] (bos first,
        pad after eos). One jitted program: the scan recomputes the decoder
        over the (short) fixed-length buffer each step — at caption lengths
        the vision tower dominates, so a KV cache is not worth the state
        plumbing."""
        if self._generate is None:
            self._generate = jax.jit(self._generate_impl,
                                     static_argnames=("max_length",))
        return self._generate(params, images, max_length=max_length)

    def _generate_impl(self, params, images, *, max_length: int):
        cfg = self.cfg
        enc = self.encode(params, images)
        b = images.shape[0]
        ids0 = jnp.full((b, max_length), cfg.pad_token_id, jnp.int32)
        ids0 = ids0.at[:, 0].set(cfg.bos_token_id)
        finished0 = jnp.zeros((b,), bool)

        def step(carry, t):
            ids, finished = carry
            logits = self.logits(params, ids, enc)  # [B, L, V]
            nxt = jnp.argmax(logits[:, t - 1, :], axis=-1).astype(jnp.int32)
            nxt = jnp.where(finished, cfg.pad_token_id, nxt)
            ids = ids.at[:, t].set(nxt)
            finished = finished | (nxt == cfg.eos_token_id)
            return (ids, finished), None

        (ids, _fin), _ = jax.lax.scan(
            step, (ids0, finished0), jnp.arange(1, max_length)
        )
        return ids

    def generate_greedy_cached(self, params, images: jnp.ndarray,
                               max_length: int = 24) -> jnp.ndarray:
        """Same contract/output as :meth:`generate_greedy`, but decoded with
        KV caches: cross-attention K/V computed once per image, self-attention
        K/V appended per step — each scan step runs the decoder over ONE token
        instead of the whole buffer (O(L) total decoder work vs O(L²))."""
        if self._generate_cached is None:
            self._generate_cached = jax.jit(self._generate_cached_impl,
                                            static_argnames=("max_length",))
        return self._generate_cached(params, images, max_length=max_length)

    def _generate_cached_impl(self, params, images, *, max_length: int):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        enc = self.encode(params, images)
        b = images.shape[0]
        d = cfg.hidden_size // cfg.num_heads
        cross_k, cross_v = self._cross_kv.apply({"params": params["text"]}, enc)

        ids0 = jnp.full((b, max_length), cfg.pad_token_id, jnp.int32)
        ids0 = ids0.at[:, 0].set(cfg.bos_token_id)
        finished0 = jnp.zeros((b,), bool)
        kc0 = jnp.zeros((cfg.num_layers, b, cfg.num_heads, max_length, d), dt)
        vc0 = jnp.zeros_like(kc0)

        def step(carry, t):
            ids, finished, kc, vc = carry
            tok = jax.lax.dynamic_index_in_dim(ids, t - 1, axis=1, keepdims=False)
            logits, kc, vc = self._step.apply(
                {"params": params["text"]}, tok, t - 1, kc, vc, cross_k, cross_v)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(finished, cfg.pad_token_id, nxt)
            ids = jax.lax.dynamic_update_slice(ids, nxt[:, None], (0, t))
            finished = finished | (nxt == cfg.eos_token_id)
            return (ids, finished, kc, vc), None

        (ids, _fin, _, _), _ = jax.lax.scan(
            step, (ids0, finished0, kc0, vc0), jnp.arange(1, max_length)
        )
        return ids


# --- HF checkpoint conversion -------------------------------------------------


def _np(t):
    return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()


def convert_hf_blip(state_dict: Mapping[str, Any], cfg: BlipConfig) -> Dict[str, Any]:
    """HF ``BlipForConditionalGeneration`` state dict → our param pytree."""
    sd = dict(state_dict)

    def lin(key):
        return {"kernel": _np(sd[key + ".weight"]).T, "bias": _np(sd[key + ".bias"])}

    def ln(key):
        return {"scale": _np(sd[key + ".weight"]), "bias": _np(sd[key + ".bias"])}

    v: Dict[str, Any] = {
        "patch_embed": {
            "kernel": np.transpose(
                _np(sd["vision_model.embeddings.patch_embedding.weight"]), (2, 3, 1, 0)
            ),
            "bias": _np(sd["vision_model.embeddings.patch_embedding.bias"]),
        },
        "cls_token": _np(sd["vision_model.embeddings.class_embedding"]).reshape(1, 1, -1),
        "pos_embed": _np(sd["vision_model.embeddings.position_embedding"]).reshape(
            1, -1, cfg.vision_width
        ),
        "post_norm": ln("vision_model.post_layernorm"),
    }
    for i in range(cfg.vision_layers):
        base = f"vision_model.encoder.layers.{i}"
        v[f"block_{i}"] = {
            "qkv": lin(f"{base}.self_attn.qkv"),
            "projection": lin(f"{base}.self_attn.projection"),
            "norm1": ln(f"{base}.layer_norm1"),
            "norm2": ln(f"{base}.layer_norm2"),
            "fc1": lin(f"{base}.mlp.fc1"),
            "fc2": lin(f"{base}.mlp.fc2"),
        }

    t: Dict[str, Any] = {
        "word_embeddings": {
            "embedding": _np(sd["text_decoder.bert.embeddings.word_embeddings.weight"])
        },
        "position_embeddings": {
            "embedding": _np(sd["text_decoder.bert.embeddings.position_embeddings.weight"])
        },
        "emb_LayerNorm": ln("text_decoder.bert.embeddings.LayerNorm"),
        "transform_dense": lin("text_decoder.cls.predictions.transform.dense"),
        "transform_LayerNorm": ln("text_decoder.cls.predictions.transform.LayerNorm"),
        "lm_head": lin("text_decoder.cls.predictions.decoder"),
    }
    for i in range(cfg.num_layers):
        base = f"text_decoder.bert.encoder.layer.{i}"
        t[f"layer_{i}"] = {
            "attention": {
                "query": lin(f"{base}.attention.self.query"),
                "key": lin(f"{base}.attention.self.key"),
                "value": lin(f"{base}.attention.self.value"),
            },
            "attention_output": {
                "dense": lin(f"{base}.attention.output.dense"),
                "LayerNorm": ln(f"{base}.attention.output.LayerNorm"),
            },
            "crossattention": {
                "query": lin(f"{base}.crossattention.self.query"),
                "key": lin(f"{base}.crossattention.self.key"),
                "value": lin(f"{base}.crossattention.self.value"),
            },
            "cross_output": {
                "dense": lin(f"{base}.crossattention.output.dense"),
                "LayerNorm": ln(f"{base}.crossattention.output.LayerNorm"),
            },
            "intermediate": {"dense": lin(f"{base}.intermediate.dense")},
            "output": {
                "dense": lin(f"{base}.output.dense"),
                "LayerNorm": ln(f"{base}.output.LayerNorm"),
            },
        }
    return {"vision": v, "text": t}


# BLIP image preprocessing constants (HF BlipImageProcessor: OPENAI CLIP stats)
BLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
BLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_images(arrs, image_size: int = 224) -> jnp.ndarray:
    """Host-side: uint8/float [B, H, W, 3] ([0,255] or [0,1]) → normalised,
    resized [B, S, S, 3] (HF BlipImageProcessor semantics)."""
    from multimodal_classification_tpu.ops.pooling import bilinear_resize

    x = np.asarray(arrs, np.float32)
    if x.ndim == 3:
        x = x[None]
    if x.max() > 1.5:
        x = x / 255.0
    chw = jnp.asarray(x.transpose(0, 3, 1, 2))
    chw = bilinear_resize(chw, (image_size, image_size))
    out = chw.transpose(0, 2, 3, 1)
    mean = jnp.asarray(BLIP_MEAN)
    std = jnp.asarray(BLIP_STD)
    return (out - mean) / std
