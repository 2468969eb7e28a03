"""Vision Transformer backbone (Flax) — DINOv2- and CLIP-compatible.

One parameterised implementation covers the reference's DINOv2 ViT-{S,B,L,G}
/14 trunks (torch.hub facebookresearch/dinov2 — reference dinov2.py:67-92
MODEL_CONFIGS) and the CLIP ViT-B/32 vision tower (clip.py). Pre-norm blocks,
optional LayerScale (DINOv2), erf- or quick-GELU, interpolatable position
embeddings. Can return every block's tokens (the multilayer extractor's
forward hooks, dinov2_multilayer.py:268-316, become a simple flag here) and
the last block's CLS attention weights (the attention-selection extractor's
qkv-recompute hook, dinov2.py:372-436).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_classification_tpu.ops.attention import merge_heads, split_heads

VIT_CONFIGS = {
    # DINOv2 trunks (patch 14, 518 px → 37×37 tokens)
    "dinov2_small": dict(patch_size=14, width=384, depth=12, heads=6, layerscale=True),
    "dinov2_base": dict(patch_size=14, width=768, depth=12, heads=12, layerscale=True),
    "dinov2_large": dict(patch_size=14, width=1024, depth=24, heads=16, layerscale=True),
    "dinov2_giant": dict(patch_size=14, width=1536, depth=40, heads=24, layerscale=True),
    # CLIP ViT-B/32 vision tower (patch 32, 224 px → 7×7 tokens)
    "clip_vit_b32": dict(
        patch_size=32, width=768, depth=12, heads=12, layerscale=False,
        quick_gelu=True, pre_ln=True,
    ),
}


class ViTBlock(nn.Module):
    width: int
    heads: int
    mlp_ratio: float = 4.0
    layerscale: bool = False
    quick_gelu: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, return_attn: bool = False):
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="norm1")(x).astype(self.dtype)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh = split_heads(q, self.heads)
        kh = split_heads(k, self.heads)
        vh = split_heads(v, self.heads)
        scale = 1.0 / np.sqrt(self.width // self.heads)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = merge_heads(jnp.einsum("bhqk,bhkd->bhqd", probs.astype(self.dtype), vh))
        attn_out = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                            name="proj")(ctx)
        if self.layerscale:
            gamma1 = self.param("ls1", nn.initializers.constant(1e-5), (self.width,),
                                jnp.float32)
            attn_out = attn_out * gamma1.astype(self.dtype)
        x = x + attn_out

        h2 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32,
                          name="norm2")(x).astype(self.dtype)
        m = nn.Dense(int(self.width * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(h2)
        m = (m * jax.nn.sigmoid(1.702 * m)) if self.quick_gelu else nn.gelu(m, approximate=False)
        m = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(m)
        if self.layerscale:
            gamma2 = self.param("ls2", nn.initializers.constant(1e-5), (self.width,),
                                jnp.float32)
            m = m * gamma2.astype(self.dtype)
        x = x + m
        if return_attn:
            return x, probs
        return x


class ViT(nn.Module):
    """Returns dict with ``tokens`` [B, 1+N, W] (post final norm), optionally
    ``all_tokens`` (every block) and ``cls_attn`` [B, heads, 1+N] (last block's
    CLS-row attention)."""

    patch_size: int = 14
    width: int = 1024
    depth: int = 24
    heads: int = 16
    mlp_ratio: float = 4.0
    layerscale: bool = True
    quick_gelu: bool = False
    pre_ln: bool = False  # CLIP applies an extra LN before the blocks
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # [B, H, W, 3] normalized
        collect_layers: Optional[Sequence[int]] = None,
        want_cls_attn: bool = False,
    ) -> Dict[str, Any]:
        b, h, w, _ = images.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        x = nn.Conv(
            self.width, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32, name="patch_embed",
        )(images.astype(self.dtype))
        x = x.reshape(b, gh * gw, self.width)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.width),
                         jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.width)), x],
                            axis=1)
        # learned position embeddings sized to this grid (+1 cls); checkpoint
        # conversion bilinearly resamples mismatched grids (convert.py)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + gh * gw, self.width), jnp.float32)
        x = x + pos.astype(self.dtype)
        if self.pre_ln:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                             name="ln_pre")(x).astype(self.dtype)

        collected = {}
        cls_attn = None
        collect = set(collect_layers or ())
        for i in range(self.depth):
            block = ViTBlock(self.width, self.heads, self.mlp_ratio, self.layerscale,
                             self.quick_gelu, self.dtype, name=f"block_{i}")
            if want_cls_attn and i == self.depth - 1:
                x, probs = block(x, return_attn=True)
                cls_attn = probs[:, :, 0, :]  # [B, heads, 1+N]
            else:
                x = block(x)
            if (i + 1) in collect:
                collected[i + 1] = x

        out_tokens = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                  param_dtype=jnp.float32, name="norm")(x)
        result: Dict[str, Any] = {"tokens": out_tokens.astype(jnp.float32),
                                  "grid": (gh, gw)}
        if collect:
            result["all_tokens"] = {k: v.astype(jnp.float32) for k, v in collected.items()}
        if want_cls_attn:
            result["cls_attn"] = cls_attn
        return result


def make_vit(name: str, dtype=jnp.bfloat16) -> ViT:
    cfg = dict(VIT_CONFIGS[name])
    cfg.setdefault("quick_gelu", False)
    cfg.setdefault("pre_ln", False)
    return ViT(dtype=dtype, **cfg)
