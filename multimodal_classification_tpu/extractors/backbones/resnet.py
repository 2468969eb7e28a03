"""ResNet backbones (Flax, NHWC, frozen-BN inference).

torchvision-exact topology (v1.5: stride in the 3×3 conv) for ResNet-50/101/
152 — the trunks behind the reference's ``resnet`` (resnet.py), ``resnet152_
roi`` (resnet152_roi.py:35-74 base/top split), ``resnet_vg``/``fasterrcnn_vg``
(RCNN_base/RCNN_top) and the Faster R-CNN backbones. BatchNorm is the frozen
eval-mode affine (extractors never train — the reference always calls them
under eval()), so it folds into a scale/bias per channel and XLA fuses it
into the convolutions.

Weight conversion from torchvision state dicts: extractors/convert.py.
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

STAGE_BLOCKS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


class FrozenBatchNorm(nn.Module):
    """Eval-mode BN: y = (x − mean)/sqrt(var + eps) · weight + bias."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        mult = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        add = (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x * mult + add


def conv(features: int, kernel: int, stride: int = 1, dtype=jnp.bfloat16, name=None,
         groups: int = 1):
    pad = kernel // 2
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)), use_bias=False,
        feature_group_count=groups,
        dtype=dtype, param_dtype=jnp.float32, name=name,
    )


class Bottleneck(nn.Module):
    """1×1 → 3×3(stride, optionally grouped) → 1×1·4 with projection shortcut.

    groups/base_width follow torchvision's ResNeXt parameterisation
    (width = planes · base_width/64 · groups) — used by the X-152++ 32×8d
    trunk (reference grid_feats_x152.py cfg)."""

    features: int  # bottleneck planes; output is features*4
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x):
        out_features = self.features * 4
        width = int(self.features * (self.base_width / 64.0)) * self.groups
        identity = x
        h = conv(width, 1, 1, self.dtype, "conv1")(x)
        h = FrozenBatchNorm(width, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = conv(width, 3, self.stride, self.dtype, "conv2", groups=self.groups)(h)
        h = FrozenBatchNorm(width, dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        h = conv(out_features, 1, 1, self.dtype, "conv3")(h)
        h = FrozenBatchNorm(out_features, dtype=self.dtype, name="bn3")(h)
        if self.stride != 1 or x.shape[-1] != out_features:
            identity = conv(out_features, 1, self.stride, self.dtype, "downsample_conv")(x)
            identity = FrozenBatchNorm(out_features, dtype=self.dtype, name="downsample_bn")(identity)
        return nn.relu(h + identity)


class ResNetStage(nn.Module):
    features: int
    num_blocks: int
    stride: int
    dtype: jnp.dtype = jnp.bfloat16
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = Bottleneck(
                self.features, self.stride if i == 0 else 1, self.dtype,
                self.groups, self.base_width, name=f"block_{i}",
            )(x)
        return x


class ResNetTrunk(nn.Module):
    """Stem + layer1..layerN; ``stages`` controls how deep (4 = through
    layer4/C5; 3 = through layer3/C4 — the ROI extractors' 'base').
    Returns a dict {"c2": ..., "c5": ...} of NHWC feature maps."""

    blocks: Sequence[int] = STAGE_BLOCKS["resnet152"]
    stages: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        h = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv1",
        )(x.astype(self.dtype))
        h = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        out = {}
        widths = (64, 128, 256, 512)
        for i in range(self.stages):
            h = ResNetStage(
                widths[i], self.blocks[i], 1 if i == 0 else 2, self.dtype,
                self.groups, self.base_width, name=f"layer{i + 1}",
            )(h)
            out[f"c{i + 2}"] = h
        return out


class ResNetTop(nn.Module):
    """layer4 applied to ROI-pooled [R, 14, 14, 1024] patches + global avg →
    [R, 2048] (the reference's backbone.forward_top, resnet152_roi.py:64-74)."""

    num_blocks: int = 3
    dtype: jnp.dtype = jnp.bfloat16
    groups: int = 1
    base_width: int = 64
    pool: bool = True

    @nn.compact
    def __call__(self, x):
        h = ResNetStage(512, self.num_blocks, 2, self.dtype, self.groups,
                        self.base_width, name="layer4")(x)
        if self.pool:
            return jnp.mean(h, axis=(1, 2))  # global average pool → [R, 2048]
        return h
