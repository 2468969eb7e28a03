"""Grid-pooled ResNet extractors: ``resnet`` and ``resnet_vg``.

Conv trunk → adaptive-average-pool the C5 map to a G×G grid → G²×2048
region features with grid spatial encodings (reference:
feature_extractors/resnet.py:17-85 ResNet-152/ImageNet;
feature_extractors/resnet_vg.py:29-69 VG ResNet-101 backbone — identical
mechanism, different trunk/weights). Fully batched + jitted (the reference
loops per image, resnet.py:78-85).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_classification_tpu.extractors.backbones.resnet import (
    STAGE_BLOCKS,
    ResNetTrunk,
)
from multimodal_classification_tpu.extractors.base import (
    BaseExtractor,
    normalize_images,
)
from multimodal_classification_tpu.ops.boxes import grid_spatial
from multimodal_classification_tpu.ops.pooling import adaptive_avg_pool2d
from multimodal_classification_tpu.registry import register_feature_extractor


class ResNetGridExtractor(BaseExtractor):
    feature_dim = 2048

    def __init__(
        self,
        arch: str = "resnet152",
        grid_size: int = 6,
        image_size: int = 224,
        checkpoint: Optional[str] = None,
        dtype: str = "bfloat16",
        **_kw,
    ):
        super().__init__()
        self.arch = arch
        self.grid_size = grid_size
        self.num_regions = grid_size * grid_size
        self.image_size = (image_size, image_size)
        self.trunk = ResNetTrunk(
            blocks=STAGE_BLOCKS[arch], stages=4, dtype=jnp.dtype(dtype)
        )
        self._spatial = jnp.asarray(grid_spatial(grid_size))
        self.checkpoint = checkpoint

    def init_params(self, rng: jax.Array):
        dummy = jnp.zeros((1, *self.image_size, 3), jnp.float32)
        params = self.trunk.init(rng, dummy)["params"]
        if self.checkpoint:
            from multimodal_classification_tpu.extractors.convert import (
                convert_torchvision_resnet,
                merge_into,
            )
            from multimodal_classification_tpu.models.convert import load_torch_checkpoint

            sd = load_torch_checkpoint(self.checkpoint)
            params, _n = merge_into(params, convert_torchvision_resnet(sd, self.arch))
        return params

    def _extract(self, params, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = normalize_images(images)
        c5 = self.trunk.apply({"params": params}, x)["c5"]  # [B, h, w, 2048]
        nchw = jnp.transpose(c5, (0, 3, 1, 2))
        pooled = adaptive_avg_pool2d(nchw, (self.grid_size, self.grid_size))
        feats = jnp.transpose(pooled, (0, 2, 3, 1)).reshape(
            images.shape[0], self.num_regions, self.feature_dim
        )
        spatial = jnp.broadcast_to(
            self._spatial[None], (images.shape[0], self.num_regions, 5)
        )
        return feats.astype(jnp.float32), spatial


@register_feature_extractor("resnet")
def _make_resnet(**kw):
    """ImageNet ResNet-152 grid extractor (reference resnet.py)."""
    kw.setdefault("arch", "resnet152")
    return ResNetGridExtractor(**kw)


@register_feature_extractor("resnet_vg")
def _make_resnet_vg(**kw):
    """VG ResNet-101 backbone, grid pooling (reference resnet_vg.py) —
    load VG weights via checkpoint= (converted with convert_vg_rcnn)."""
    kw.setdefault("arch", "resnet101")
    return ResNetGridExtractor(**kw)
