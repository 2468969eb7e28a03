"""ResNet-152 + ROI pooling — the reference's best on-the-fly extractor
(0.7197 AUROC; reference: feature_extractors/resnet152_roi.py).

Pipeline: base trunk (conv1..layer3) on 600×600 → [B, 38, 38, 1024];
multi-scale proposal sweep (5 scales × 5 aspect ratios, 40%-stride) → NMS
diverse selection preferring ~15%-area boxes → RoIPool(14×14, 1/16) → layer4
top + global avg pool → [B, 36, 2048].

TPU-first observation: the proposal grid + NMS selection depend only on the
(fixed) image size — so the reference's per-image proposal/NMS work
(resnet152_roi.py:208-293) is hoisted to a one-time static precomputation at
construction; the device graph is pure conv/pool/matmul.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_classification_tpu.extractors.backbones.resnet import (
    STAGE_BLOCKS,
    ResNetTop,
    ResNetTrunk,
)
from multimodal_classification_tpu.extractors.base import (
    BaseExtractor,
    normalize_images,
)
from multimodal_classification_tpu.ops.nms import nms
from multimodal_classification_tpu.ops.roi import roi_pool
from multimodal_classification_tpu.registry import register_feature_extractor

SCALES = (0.15, 0.25, 0.35, 0.5, 0.7)
ASPECT_RATIOS = (0.5, 0.75, 1.0, 1.33, 2.0)


def multi_scale_proposals(img_h: int, img_w: int) -> np.ndarray:
    """Dense multi-scale sweep (reference resnet152_roi.py:208-253)."""
    boxes = []
    for scale in SCALES:
        for ar in ASPECT_RATIOS:
            box_w = img_w * scale
            box_h = box_w / ar
            box_h = min(box_h, img_h * 0.95)
            box_w = min(box_w, img_w * 0.95)
            stride_x = max(box_w * 0.4, 20)
            stride_y = max(box_h * 0.4, 20)
            x = 0.0
            while x + box_w <= img_w:
                y = 0.0
                while y + box_h <= img_h:
                    boxes.append([x, y, x + box_w, y + box_h])
                    y += stride_y
                x += stride_x
    return np.asarray(boxes, np.float32)


def grid_proposals(img_h: int, img_w: int, num_regions: int) -> np.ndarray:
    g = int(num_regions ** 0.5)
    cell_h, cell_w = img_h / g, img_w / g
    return np.asarray(
        [
            [j * cell_w, i * cell_h, (j + 1) * cell_w, (i + 1) * cell_h]
            for i in range(g)
            for j in range(g)
        ],
        np.float32,
    )


def select_proposals(img_h: int, img_w: int, num_regions: int) -> np.ndarray:
    """Static proposal selection (reference resnet152_roi.py:255-293): score
    by 1−|area−0.15|, NMS@0.5 for diversity, pad with grid/leftovers."""
    boxes = multi_scale_proposals(img_h, img_w)
    if len(boxes) <= num_regions:
        pad = grid_proposals(img_h, img_w, num_regions)
        return np.concatenate([boxes, pad])[:num_regions]
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]) / (img_h * img_w)
    scores = 1.0 - np.abs(areas - 0.15)
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, len(boxes))
    keep = np.asarray(idx)[np.asarray(valid)]
    if len(keep) >= num_regions:
        return boxes[keep[:num_regions]]
    remaining = [i for i in range(len(boxes)) if i not in set(keep.tolist())]
    keep = np.concatenate([keep, np.asarray(remaining[: num_regions - len(keep)])])
    return boxes[keep.astype(int)]


def normalize_boxes_spatial(boxes: np.ndarray, img_w: int, img_h: int) -> np.ndarray:
    n = boxes.copy()
    n[:, [0, 2]] = np.clip(n[:, [0, 2]] / img_w, 0, 1)
    n[:, [1, 3]] = np.clip(n[:, [1, 3]] / img_h, 0, 1)
    area = (n[:, 2] - n[:, 0]) * (n[:, 3] - n[:, 1])
    return np.concatenate([n, area[:, None]], axis=1).astype(np.float32)


class ResNet152ROIExtractor(BaseExtractor):
    feature_dim = 2048

    def __init__(
        self,
        num_regions: int = 36,
        image_size: int = 600,
        pool_size: int = 14,
        checkpoint: Optional[str] = None,
        dtype: str = "bfloat16",
        use_multi_scale: bool = True,
        **_kw,
    ):
        super().__init__()
        self.num_regions = num_regions
        self.image_size = (image_size, image_size)
        self.pool_size = pool_size
        self.checkpoint = checkpoint
        dt = jnp.dtype(dtype)
        self.base = ResNetTrunk(blocks=STAGE_BLOCKS["resnet152"], stages=3, dtype=dt)
        self.top = ResNetTop(num_blocks=STAGE_BLOCKS["resnet152"][3], dtype=dt)
        if use_multi_scale:
            boxes = select_proposals(image_size, image_size, num_regions)
        else:
            boxes = grid_proposals(image_size, image_size, num_regions)
        self._boxes = jnp.asarray(boxes)
        self._spatial = jnp.asarray(
            normalize_boxes_spatial(boxes, image_size, image_size)
        )

    def init_params(self, rng: jax.Array):
        r1, r2 = jax.random.split(rng)
        dummy = jnp.zeros((1, *self.image_size, 3), jnp.float32)
        base_params = self.base.init(r1, dummy)["params"]
        pooled_dummy = jnp.zeros((1, self.pool_size, self.pool_size, 1024), jnp.float32)
        top_params = self.top.init(r2, pooled_dummy)["params"]
        params = {"base": base_params, "top": top_params}
        if self.checkpoint:
            from multimodal_classification_tpu.extractors.convert import (
                convert_torchvision_resnet,
                convert_torchvision_resnet_top,
                merge_into,
            )
            from multimodal_classification_tpu.models.convert import load_torch_checkpoint

            sd = load_torch_checkpoint(self.checkpoint)
            params["base"], _ = merge_into(
                params["base"], convert_torchvision_resnet(sd, "resnet152", stages=3)
            )
            params["top"], _ = merge_into(
                params["top"], convert_torchvision_resnet_top(sd, "resnet152")
            )
        return params

    def _extract(self, params, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = images.shape[0]
        x = normalize_images(images)
        c4 = self.base.apply({"params": params["base"]}, x)["c4"]  # [B, 38, 38, 1024]
        chw = jnp.transpose(c4, (0, 3, 1, 2)).astype(jnp.float32)

        def pool_one(feat_chw):
            # [R, C, P, P] → NHWC patches
            pooled = roi_pool(feat_chw, self._boxes, (self.pool_size, self.pool_size),
                              spatial_scale=1.0 / 16.0)
            return jnp.transpose(pooled, (0, 2, 3, 1))

        patches = jax.vmap(pool_one)(chw)  # [B, R, P, P, 1024]
        flat = patches.reshape(b * self.num_regions, self.pool_size, self.pool_size, 1024)
        feats = self.top.apply({"params": params["top"]}, flat)  # [B*R, 2048]
        feats = feats.reshape(b, self.num_regions, self.feature_dim)
        spatial = jnp.broadcast_to(self._spatial[None], (b, self.num_regions, 5))
        return feats.astype(jnp.float32), spatial


@register_feature_extractor("resnet152_roi")
def _make_resnet152_roi(**kw):
    return ResNet152ROIExtractor(**kw)
