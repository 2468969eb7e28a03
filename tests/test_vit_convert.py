"""ViT checkpoint converters: DINOv2 torch-hub layout and HF CLIP vision
tower layout fully merge into our ViT, including position-table resampling."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from multimodal_classification_tpu.extractors.backbones.vit import ViT
from multimodal_classification_tpu.extractors.convert import (
    convert_clip_vision_tower,
    convert_dinov2_vit,
    merge_into,
)


def _dinov2_sd(width=32, depth=2, patch=8, grid=4):
    sd = {}
    sd["patch_embed.proj.weight"] = torch.randn(width, 3, patch, patch)
    sd["patch_embed.proj.bias"] = torch.randn(width)
    sd["cls_token"] = torch.randn(1, 1, width)
    sd["pos_embed"] = torch.randn(1, 1 + grid * grid, width)
    for i in range(depth):
        b = f"blocks.{i}"
        sd[f"{b}.attn.qkv.weight"] = torch.randn(3 * width, width)
        sd[f"{b}.attn.qkv.bias"] = torch.randn(3 * width)
        sd[f"{b}.attn.proj.weight"] = torch.randn(width, width)
        sd[f"{b}.attn.proj.bias"] = torch.randn(width)
        for n in ("norm1", "norm2"):
            sd[f"{b}.{n}.weight"] = torch.randn(width)
            sd[f"{b}.{n}.bias"] = torch.randn(width)
        sd[f"{b}.mlp.fc1.weight"] = torch.randn(4 * width, width)
        sd[f"{b}.mlp.fc1.bias"] = torch.randn(4 * width)
        sd[f"{b}.mlp.fc2.weight"] = torch.randn(width, 4 * width)
        sd[f"{b}.mlp.fc2.bias"] = torch.randn(width)
        sd[f"{b}.ls1.gamma"] = torch.randn(width)
        sd[f"{b}.ls2.gamma"] = torch.randn(width)
    sd["norm.weight"] = torch.randn(width)
    sd["norm.bias"] = torch.randn(width)
    return sd


def test_dinov2_conversion_full_merge_and_pos_resample():
    width, depth, patch = 32, 2, 8
    vit = ViT(patch_size=patch, width=width, depth=depth, heads=2,
              layerscale=True, dtype=jnp.float32)
    img_size = 48  # 6×6 grid ≠ the checkpoint's 4×4 → resample
    init = vit.init(jax.random.key(0), jnp.zeros((1, img_size, img_size, 3)))["params"]
    loaded = convert_dinov2_vit(_dinov2_sd(width, depth, patch, grid=4),
                                depth, target_tokens=1 + 36)
    merged, n = merge_into(init, loaded)
    total = len(jax.tree.leaves(init))
    assert n == total, f"{n}/{total}"
    out = vit.apply({"params": merged}, jnp.ones((1, img_size, img_size, 3)))
    assert np.all(np.isfinite(np.asarray(out["tokens"])))


def _clip_sd(width=32, depth=2, patch=8, grid=4):
    sd = {}
    pre = "vision_model."
    sd[pre + "embeddings.patch_embedding.weight"] = torch.randn(width, 3, patch, patch)
    sd[pre + "embeddings.class_embedding"] = torch.randn(width)
    sd[pre + "embeddings.position_embedding.weight"] = torch.randn(1 + grid * grid, width)
    sd[pre + "pre_layrnorm.weight"] = torch.randn(width)
    sd[pre + "pre_layrnorm.bias"] = torch.randn(width)
    for i in range(depth):
        b = pre + f"encoder.layers.{i}"
        for pn in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{b}.self_attn.{pn}.weight"] = torch.randn(width, width)
            sd[f"{b}.self_attn.{pn}.bias"] = torch.randn(width)
        for n in ("layer_norm1", "layer_norm2"):
            sd[f"{b}.{n}.weight"] = torch.randn(width)
            sd[f"{b}.{n}.bias"] = torch.randn(width)
        sd[f"{b}.mlp.fc1.weight"] = torch.randn(4 * width, width)
        sd[f"{b}.mlp.fc1.bias"] = torch.randn(4 * width)
        sd[f"{b}.mlp.fc2.weight"] = torch.randn(width, 4 * width)
        sd[f"{b}.mlp.fc2.bias"] = torch.randn(width)
    sd[pre + "post_layernorm.weight"] = torch.randn(width)
    sd[pre + "post_layernorm.bias"] = torch.randn(width)
    return sd


def test_clip_conversion_full_merge():
    width, depth, patch = 32, 2, 8
    vit = ViT(patch_size=patch, width=width, depth=depth, heads=2,
              layerscale=False, quick_gelu=True, pre_ln=True, dtype=jnp.float32)
    img_size = 32  # 4×4 grid matches checkpoint
    init = vit.init(jax.random.key(0), jnp.zeros((1, img_size, img_size, 3)))["params"]
    loaded = convert_clip_vision_tower(_clip_sd(width, depth, patch, grid=4), depth)
    merged, n = merge_into(init, loaded)
    total = len(jax.tree.leaves(init))
    assert n == total, f"{n}/{total}"
    out = vit.apply({"params": merged}, jnp.ones((1, img_size, img_size, 3)))
    assert np.all(np.isfinite(np.asarray(out["tokens"])))
