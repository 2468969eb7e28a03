"""ViT-based extractors: ``dinov2``, ``dinov2_multilayer``, ``clip``.

- ``dinov2`` (reference: feature_extractors/dinov2.py): DINOv2 ViT-{S,B,L,G}
  /14 at 518px → 37×37 patch tokens → projection MLP (width→2048, LayerNorm+
  GELU) → either bilinear interpolation of the patch grid down to G×G
  (``selection="interpolate"``, dinov2.py:256-306) or top-K patches by CLS
  attention (``selection="attention"``, dinov2.py:308-370 — the reference
  re-computes qkv in a forward hook; our ViT just returns the CLS row).
- ``dinov2_multilayer`` (dinov2_multilayer.py): tokens from blocks
  (6,12,18,24) fused by concat (4W→2048), softmax-weighted sum, or a
  learned-query cross-layer attention, then interpolated to the grid.
- ``clip`` (clip.py): CLIP ViT-B/32 patch tokens (minus CLS) → MLP to 2048 →
  bilinear 7×7→6×6.

All fully batched + jitted.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_classification_tpu.extractors.backbones.vit import make_vit
from multimodal_classification_tpu.extractors.base import (
    BaseExtractor,
    CLIP_MEAN,
    CLIP_STD,
    IMAGENET_MEAN,
    IMAGENET_STD,
    normalize_images,
)
from multimodal_classification_tpu.ops.boxes import grid_spatial
from multimodal_classification_tpu.ops.pooling import bilinear_resize
from multimodal_classification_tpu.registry import register_feature_extractor

MULTILAYER_BLOCKS = {  # reference dinov2_multilayer.py: blocks [6, 12, 18, 24] for ViT-L
    "dinov2_small": (3, 6, 9, 12),
    "dinov2_base": (3, 6, 9, 12),
    "dinov2_large": (6, 12, 18, 24),
    "dinov2_giant": (10, 20, 30, 40),
}


class ProjectionMLP(nn.Module):
    """width → 2048 with LayerNorm + GELU (reference dinov2.py projection)."""

    out_dim: int = 2048
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="dense1")(x.astype(self.dtype))
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="norm")(h)
        h = nn.gelu(h.astype(self.dtype), approximate=False)
        return nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="dense2")(h)


def _interpolate_grid(tokens: jnp.ndarray, grid: Tuple[int, int], out: int) -> jnp.ndarray:
    """[B, gh*gw, C] → [B, out*out, C] bilinear (dinov2.py:293-298)."""
    b, _n, c = tokens.shape
    gh, gw = grid
    img = tokens.reshape(b, gh, gw, c).transpose(0, 3, 1, 2)
    img = bilinear_resize(img, (out, out))
    return img.transpose(0, 2, 3, 1).reshape(b, out * out, c)


def _patch_spatial(grid: Tuple[int, int]) -> np.ndarray:
    """[gh*gw, 5] normalised box per patch (dinov2.py:438-466)."""
    gh, gw = grid
    ys = np.linspace(0, 1, gh + 1, dtype=np.float32)
    xs = np.linspace(0, 1, gw + 1, dtype=np.float32)
    out = []
    for i in range(gh):
        for j in range(gw):
            x1, y1, x2, y2 = xs[j], ys[i], xs[j + 1], ys[i + 1]
            out.append((x1, y1, x2, y2, (x2 - x1) * (y2 - y1)))
    return np.asarray(out, np.float32)


class DINOv2Extractor(BaseExtractor):
    feature_dim = 2048

    def __init__(
        self,
        model_size: str = "large",
        num_regions: int = 36,
        selection: str = "interpolate",  # interpolate | attention
        image_size: int = 518,
        checkpoint: Optional[str] = None,
        dtype: str = "bfloat16",
        **_kw,
    ):
        super().__init__()
        name = f"dinov2_{model_size}"
        self.vit = make_vit(name, jnp.dtype(dtype))
        self.proj = ProjectionMLP(2048, jnp.dtype(dtype))
        self.num_regions = num_regions
        self.grid_out = int(num_regions ** 0.5)
        self.selection = selection
        self.image_size = (image_size, image_size)
        self.checkpoint = checkpoint
        g = image_size // self.vit.patch_size
        self._grid = (g, g)
        self._grid_spatial = jnp.asarray(grid_spatial(self.grid_out))
        self._patch_spatial = jnp.asarray(_patch_spatial(self._grid))

    def init_params(self, rng: jax.Array):
        r1, r2 = jax.random.split(rng)
        dummy = jnp.zeros((1, *self.image_size, 3), jnp.float32)
        vit_params = self.vit.init(r1, dummy, want_cls_attn=True)["params"]
        proj_params = self.proj.init(r2, jnp.zeros((1, self.vit.width)))["params"]
        return {"vit": vit_params, "proj": proj_params}

    def _extract(self, params, images):
        b = images.shape[0]
        x = normalize_images(images, IMAGENET_MEAN, IMAGENET_STD)
        want_attn = self.selection == "attention"
        out = self.vit.apply({"params": params["vit"]}, x, want_cls_attn=want_attn)
        patches = out["tokens"][:, 1:]  # [B, N, W]
        if self.selection == "interpolate":
            sel = _interpolate_grid(patches, self._grid, self.grid_out)
            feats = self.proj.apply({"params": params["proj"]}, sel)
            spatial = jnp.broadcast_to(
                self._grid_spatial[None], (b, self.num_regions, 5)
            )
        else:
            # top-K patches by mean-over-heads CLS attention (dinov2.py:308-370)
            attn = jnp.mean(out["cls_attn"].astype(jnp.float32), axis=1)[:, 1:]  # [B, N]
            _vals, idx = jax.lax.top_k(attn, self.num_regions)  # [B, K]
            sel = jnp.take_along_axis(patches, idx[:, :, None], axis=1)
            feats = self.proj.apply({"params": params["proj"]}, sel)
            spatial = self._patch_spatial[idx]  # [B, K, 5]
        return feats.astype(jnp.float32), spatial.astype(jnp.float32)


class LayerFusion(nn.Module):
    """Fuse L per-layer token stacks [B, N, L, W] → [B, N, 2048]
    (reference dinov2_multilayer.py:222-258, 430-507)."""

    fusion: str  # concat | weighted_sum | attention
    width: int
    num_layers: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, stacks: jnp.ndarray) -> jnp.ndarray:
        b, n, l, w = stacks.shape
        x = stacks.astype(self.dtype)
        if self.fusion == "concat":
            flat = x.transpose(0, 1, 2, 3).reshape(b, n, l * w)
            return ProjectionMLP(2048, self.dtype, name="proj")(flat)
        if self.fusion == "weighted_sum":
            logits = self.param("layer_weights", nn.initializers.zeros, (l,), jnp.float32)
            wts = jax.nn.softmax(logits).astype(self.dtype)
            fused = jnp.einsum("bnlw,l->bnw", x, wts)
            return ProjectionMLP(2048, self.dtype, name="proj")(fused)
        if self.fusion == "attention":
            # learned query attends across the L layer variants of each token
            query = self.param("query", nn.initializers.normal(0.02), (1, 1, w),
                               jnp.float32)
            q = jnp.broadcast_to(query.astype(self.dtype), (b, n, w))
            scores = jnp.einsum("bnw,bnlw->bnl", q, x,
                                preferred_element_type=jnp.float32) / np.sqrt(w)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            fused = jnp.einsum("bnl,bnlw->bnw", probs, x)
            return ProjectionMLP(2048, self.dtype, name="proj")(fused)
        raise ValueError(f"unknown fusion {self.fusion}")


class DINOv2MultiLayerExtractor(BaseExtractor):
    feature_dim = 2048

    def __init__(
        self,
        model_size: str = "large",
        num_regions: int = 36,
        fusion: str = "concat",
        image_size: int = 518,
        checkpoint: Optional[str] = None,
        dtype: str = "bfloat16",
        layers: Optional[Sequence[int]] = None,
        **_kw,
    ):
        super().__init__()
        name = f"dinov2_{model_size}"
        dt = jnp.dtype(dtype)
        self.vit = make_vit(name, dt)
        self.layers = tuple(layers or MULTILAYER_BLOCKS[name])
        self.fuse = LayerFusion(fusion, self.vit.width, len(self.layers), dt)
        self.num_regions = num_regions
        self.grid_out = int(num_regions ** 0.5)
        self.image_size = (image_size, image_size)
        self.checkpoint = checkpoint
        g = image_size // self.vit.patch_size
        self._grid = (g, g)
        self._grid_spatial = jnp.asarray(grid_spatial(self.grid_out))

    def init_params(self, rng: jax.Array):
        r1, r2 = jax.random.split(rng)
        dummy = jnp.zeros((1, *self.image_size, 3), jnp.float32)
        vit_params = self.vit.init(r1, dummy, collect_layers=self.layers)["params"]
        n = self._grid[0] * self._grid[1]
        fuse_params = self.fuse.init(
            r2, jnp.zeros((1, n, len(self.layers), self.vit.width))
        )["params"]
        return {"vit": vit_params, "fuse": fuse_params}

    def _extract(self, params, images):
        b = images.shape[0]
        x = normalize_images(images, IMAGENET_MEAN, IMAGENET_STD)
        out = self.vit.apply({"params": params["vit"]}, x, collect_layers=self.layers)
        stacks = jnp.stack(
            [out["all_tokens"][l][:, 1:] for l in self.layers], axis=2
        )  # [B, N, L, W]
        fused = self.fuse.apply({"params": params["fuse"]}, stacks)  # [B, N, 2048]
        sel = _interpolate_grid(fused, self._grid, self.grid_out)
        spatial = jnp.broadcast_to(self._grid_spatial[None], (b, self.num_regions, 5))
        return sel.astype(jnp.float32), spatial


class CLIPExtractor(BaseExtractor):
    feature_dim = 2048

    def __init__(
        self,
        num_regions: int = 36,
        image_size: int = 224,
        checkpoint: Optional[str] = None,
        dtype: str = "bfloat16",
        **_kw,
    ):
        super().__init__()
        dt = jnp.dtype(dtype)
        self.vit = make_vit("clip_vit_b32", dt)
        self.proj = ProjectionMLP(2048, dt)
        self.num_regions = num_regions
        self.grid_out = int(num_regions ** 0.5)
        self.image_size = (image_size, image_size)
        self.checkpoint = checkpoint
        g = image_size // self.vit.patch_size
        self._grid = (g, g)
        self._grid_spatial = jnp.asarray(grid_spatial(self.grid_out))

    def init_params(self, rng: jax.Array):
        r1, r2 = jax.random.split(rng)
        dummy = jnp.zeros((1, *self.image_size, 3), jnp.float32)
        vit_params = self.vit.init(r1, dummy)["params"]
        proj_params = self.proj.init(r2, jnp.zeros((1, self.vit.width)))["params"]
        return {"vit": vit_params, "proj": proj_params}

    def _extract(self, params, images):
        b = images.shape[0]
        x = normalize_images(images, CLIP_MEAN, CLIP_STD)
        out = self.vit.apply({"params": params["vit"]}, x)
        patches = out["tokens"][:, 1:]
        feats = self.proj.apply({"params": params["proj"]}, patches)
        sel = _interpolate_grid(feats, self._grid, self.grid_out)
        spatial = jnp.broadcast_to(self._grid_spatial[None], (b, self.num_regions, 5))
        return sel.astype(jnp.float32), spatial


@register_feature_extractor("dinov2")
def _make_dinov2(**kw):
    return DINOv2Extractor(**kw)


@register_feature_extractor("dinov2_multilayer")
def _make_dinov2_multilayer(**kw):
    return DINOv2MultiLayerExtractor(**kw)


@register_feature_extractor("clip")
def _make_clip(**kw):
    return CLIPExtractor(**kw)
