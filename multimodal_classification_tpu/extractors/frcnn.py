"""Faster R-CNN extractor family — static-shape TPU re-design.

Variants (reference: feature_extractors/, SURVEY.md §2.2):

- ``fasterrcnn`` — FPN detector on ResNet-50 (torchvision R50-FPN-v2 COCO in
  the reference, fasterrcnn.py): RPN proposals → class scores ≥ threshold →
  top-36 (padded with grid boxes) → MultiScaleRoIAlign → flatten 256·7·7 →
  MLP proj to 2048.
- ``fasterrcnn_resnet152`` — same graph on a hand-built ResNet-152+FPN
  (fasterrcnn_resnet152.py:34-161).
- ``fasterrcnn_vg`` — VG bottom-up-attention ResNet-101 (fasterrcnn_vg.py):
  static grid+multiscale proposals scored by the 1601-way VG classifier head
  (max non-background class), masked NMS, RoIPool(14×14, 1/16) → layer4 →
  2048.
- ``fasterrcnn_vg_rpn`` — same trunk with the *trained RPN* re-implemented
  (fasterrcnn_vg_rpn.py:34-175): 3×3 conv + cls/bbox heads, 12 anchors
  (4 scales × 3 ratios, stride 16), delta decode with exp clamp, clip,
  min-size filter, pre-NMS top-6000, NMS@0.7 → 300, classifier rescore,
  top-36.
- ``grid_x152`` / ``grid_x152_standard`` — detectron2-style X-152++ (ResNeXt
  32×8d, Res5ROIHeads; grid_feats_x152.py): C4 RPN → ROIAlignV2 → Res5 →
  pooled 2048 features; sigmoid objectness ≥ 0.2, top-100, zero-padded.

XLA discipline: every dynamic-count op in the reference (torchvision NMS,
score thresholds, variable box lists) becomes fixed-slot + validity-mask
(ops.nms) or top-k; all shapes static.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_classification_tpu.extractors.backbones.resnet import (
    STAGE_BLOCKS,
    FrozenBatchNorm,
    ResNetTop,
    ResNetTrunk,
)
from multimodal_classification_tpu.extractors.base import (
    BaseExtractor,
    normalize_images,
)
from multimodal_classification_tpu.extractors.resnet_roi import (
    grid_proposals,
    multi_scale_proposals,
    normalize_boxes_spatial,
)
from multimodal_classification_tpu.ops.boxes import (
    clip_boxes,
    decode_deltas,
    generate_anchors,
    generate_anchors_torchvision,
)
from multimodal_classification_tpu.ops.nms import batched_nms, nms
from multimodal_classification_tpu.ops.roi import roi_align, roi_pool
from multimodal_classification_tpu.registry import register_feature_extractor


# ---------------------------------------------------------------------------
# FPN (torchvision fasterrcnn_resnet50_fpn_v2 topology, so the COCO
# checkpoint converts key-for-key — see extractors/convert.py)
# ---------------------------------------------------------------------------


class ConvBN(nn.Module):
    """torchvision ``Conv2dNormActivation`` with BatchNorm: conv (no bias) +
    frozen BN, optional ReLU."""

    features: int
    kernel: int = 3
    relu: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        h = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        h = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn")(h)
        return nn.relu(h) if self.relu else h


class FPN(nn.Module):
    """FeaturePyramidNetwork, v2 flavor (BN in inner/layer blocks, no
    activations): lateral 1×1 ConvBN + top-down 2× upsample + 3×3 ConvBN →
    P2..P5, plus P6 via stride-2 maxpool (LastLevelMaxPool). The reference
    uses this through torchvision (fasterrcnn.py:36-38) and hand-assembles
    the same for R152 (fasterrcnn_resnet152.py:34-100)."""

    out_channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        names = ["c2", "c3", "c4", "c5"]
        laterals = [
            ConvBN(self.out_channels, 1, relu=False, dtype=self.dtype,
                   name=f"inner_{n}")(feats[n])
            for n in names
        ]
        outs = {}
        prev = laterals[-1]
        for i in range(len(names) - 1, -1, -1):
            if i < len(names) - 1:
                up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
                up = up[:, : laterals[i].shape[1], : laterals[i].shape[2], :]
                prev = laterals[i] + up
            outs[f"p{i + 2}"] = ConvBN(
                self.out_channels, 3, relu=False, dtype=self.dtype,
                name=f"layer_{names[i]}",
            )(prev)
        outs["p6"] = nn.max_pool(outs["p5"], (1, 1), strides=(2, 2))
        return outs


class RPNHead(nn.Module):
    """Shared 3×3 conv(s) + 1×1 objectness / 1×1 box-delta heads.

    ``conv_depth=1`` matches detectron2's StandardRPNHead (grid_x152);
    ``conv_depth=2`` matches torchvision's v2 RPNHead (rpn.head.conv.{0,1}.0
    in the COCO checkpoint). Convs carry biases in both upstreams."""

    num_anchors: int
    in_channels: int = 256
    conv_depth: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = x
        for j in range(self.conv_depth):
            name = "conv" if self.conv_depth == 1 else f"conv{j}"
            h = nn.relu(
                nn.Conv(self.in_channels, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, param_dtype=jnp.float32, name=name)(h)
            )
        logits = nn.Conv(self.num_anchors, (1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="cls_logits")(h)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bbox_pred")(h)
        return logits, deltas


def rpn_proposals(
    logits: jnp.ndarray,  # [H, W, A]
    deltas: jnp.ndarray,  # [H, W, A*4]
    anchors: jnp.ndarray,  # [H*W*A, 4]
    img_hw: Tuple[int, int],
    pre_nms_top_n: int = 2000,
    post_nms_top_n: int = 300,
    nms_thresh: float = 0.7,
    min_size: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static-shape proposal generation for one level/image →
    (boxes [post, 4], scores [post], valid [post])."""
    scores = logits.reshape(-1)
    deltas = deltas.reshape(-1, 4)
    n = scores.shape[0]
    k = min(pre_nms_top_n, n)
    top_scores, idx = jax.lax.top_k(scores, k)
    boxes = decode_deltas(anchors[idx], deltas[idx])
    boxes = clip_boxes(boxes, img_hw[0], img_hw[1])
    ws = boxes[:, 2] - boxes[:, 0]
    hs = boxes[:, 3] - boxes[:, 1]
    keep = (ws >= min_size) & (hs >= min_size)
    masked_scores = jnp.where(keep, top_scores, -jnp.inf)
    sel, valid = nms(boxes, masked_scores, nms_thresh, post_nms_top_n)
    sel_c = jnp.maximum(sel, 0)
    return boxes[sel_c], jnp.where(valid, masked_scores[sel_c], -jnp.inf), valid


def fpn_level_assign(boxes: jnp.ndarray, k0: int = 4, kmin: int = 2, kmax: int = 5):
    """FPN paper level assignment: k = floor(k0 + log2(sqrt(area)/224))."""
    area = jnp.maximum((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1e-6)
    k = jnp.floor(k0 + jnp.log2(jnp.sqrt(area) / 224.0 + 1e-8))
    return jnp.clip(k, kmin, kmax).astype(jnp.int32)


def multiscale_roi_align(
    pyramid: Dict[str, jnp.ndarray],  # {"p2".."p5": [H, W, C]} single image
    boxes: jnp.ndarray,  # [R, 4] image pixels
    output_size: int = 7,
) -> jnp.ndarray:
    """MultiScaleRoIAlign (torchvision semantics): pool every box from every
    level, then select per-box by level assignment — branchless/static."""
    levels = fpn_level_assign(boxes)
    pooled_all = []
    for lvl, name in enumerate(["p2", "p3", "p4", "p5"], start=2):
        feat = jnp.transpose(pyramid[name], (2, 0, 1))  # CHW
        pooled = roi_align(
            feat, boxes, (output_size, output_size),
            spatial_scale=1.0 / (2 ** lvl), sampling_ratio=2,
        )  # [R, C, P, P]
        pooled_all.append(pooled)
    stacked = jnp.stack(pooled_all)  # [4, R, C, P, P]
    sel = jnp.take_along_axis(
        stacked, (levels - 2)[None, :, None, None, None], axis=0
    )[0]
    return sel  # [R, C, P, P]


# ---------------------------------------------------------------------------
# FPN-based extractors (fasterrcnn / fasterrcnn_resnet152)
# ---------------------------------------------------------------------------


class _FPNDetectorCore(nn.Module):
    arch: str
    num_classes: int = 91  # COCO
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        trunk = ResNetTrunk(STAGE_BLOCKS[self.arch], stages=4, dtype=self.dtype,
                            name="body")
        pyramid = FPN(dtype=self.dtype, name="fpn")(trunk(images))
        head = RPNHead(num_anchors=3, conv_depth=2, dtype=self.dtype,
                       name="rpn_head")
        rpn_out = {name: head(pyramid[name]) for name in ("p2", "p3", "p4", "p5", "p6")}
        return pyramid, rpn_out


class FastRCNNConvFCHead(nn.Module):
    """torchvision v2 box head: 4× (3×3 conv-BN-ReLU, 256ch) on the pooled
    [R, 7, 7, 256] patch, flatten, Linear→1024, ReLU
    (roi_heads.box_head.{0-3}.{0,1} + .5 in the COCO checkpoint)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled: jnp.ndarray):  # [R, 7, 7, 256]
        h = pooled
        for j in range(4):
            h = ConvBN(256, 3, relu=True, dtype=self.dtype, name=f"conv{j}")(h)
        h = h.reshape(h.shape[0], -1)  # (H, W, C) flatten — converter permutes
        h = nn.relu(nn.Dense(1024, dtype=self.dtype, param_dtype=jnp.float32,
                             name="fc")(h))
        return h


class BoxPredictor(nn.Module):
    """FastRCNNPredictor: class scores + per-class box deltas."""

    num_classes: int = 91
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, box_feats: jnp.ndarray):
        cls = nn.Dense(self.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
                       name="cls_score")(box_feats)
        deltas = nn.Dense(self.num_classes * 4, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="bbox_pred")(box_feats)
        return cls, deltas


class FeatureProjection(nn.Module):
    """The reference extractor's own (untrained) projection of the pooled
    256·7·7 patch to 2048 (fasterrcnn.py:45-49,81-89): Linear→1024, ReLU,
    Linear→2048."""

    out_dim: int = 2048
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled_flat: jnp.ndarray):
        h = nn.relu(nn.Dense(1024, dtype=self.dtype, param_dtype=jnp.float32,
                             name="fc1")(pooled_flat))
        return nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(h)


# per-level anchor scales for FPN RPN (torchvision: one size per level, 3 ratios)
FPN_ANCHOR_SIZES = {"p2": 32, "p3": 64, "p4": 128, "p5": 256, "p6": 512}


def _grid_pad_table(image_size: int, num_regions: int) -> np.ndarray:
    """[num_regions+1, num_regions, 4] table: row k = the grid boxes the
    reference generates when k slots need padding (fasterrcnn.py:91-118
    sizes the grid as ``int(sqrt(k)) + 1`` — layout depends on k, so we
    precompute every possible k and select statically)."""
    table = np.zeros((num_regions + 1, num_regions, 4), np.float32)
    for k in range(1, num_regions + 1):
        g = int(k ** 0.5) + 1
        cell = image_size / g
        boxes = [
            (j * cell, i * cell, (j + 1) * cell, (i + 1) * cell)
            for i in range(g) for j in range(g)
        ][:k]
        table[k, :k] = np.asarray(boxes, np.float32)
    return table


class FasterRCNNFPNExtractor(BaseExtractor):
    """torchvision-faithful FPN detector feature extractor (reference
    fasterrcnn.py): full detect pass (RPN filter_proposals semantics → ROI
    head → per-class decode + batched NMS) → boxes ≥ conf threshold → top-N
    by score, grid-padded → MultiScaleRoIAlign over the final boxes →
    (untrained) MLP projection to 2048.

    Static-shape deviations from torchvision, documented: per-level NMS
    survivor slots are capped at ``rpn_post_nms_top_n`` (then the global
    top-``rpn_post_nms_top_n`` by score, matching filter_proposals' final
    sort), and detection NMS runs over the top-``det_pre_nms`` class-box
    pairs instead of every pair above 0.05 (the dropped tail is below any
    plausible 0.2 confidence cut)."""

    feature_dim = 2048

    def __init__(
        self,
        arch: str = "resnet50",
        num_regions: int = 36,
        image_size: int = 800,
        confidence_threshold: float = 0.2,
        checkpoint: Optional[str] = None,
        backbone_checkpoint: Optional[str] = None,
        rpn_pre_nms_top_n: int = 1000,
        rpn_post_nms_top_n: int = 512,
        det_pre_nms: int = 512,
        det_score_thresh: float = 0.05,
        det_nms_thresh: float = 0.5,
        dtype: str = "bfloat16",
        **_kw,
    ):
        super().__init__()
        self.arch = arch
        self.num_regions = num_regions
        self.image_size = (image_size, image_size)
        self.conf_thresh = confidence_threshold
        self.checkpoint = checkpoint
        self.backbone_checkpoint = backbone_checkpoint
        self.rpn_pre_nms_top_n = rpn_pre_nms_top_n
        self.rpn_post_nms_top_n = rpn_post_nms_top_n
        self.det_pre_nms = det_pre_nms
        self.det_score_thresh = det_score_thresh
        self.det_nms_thresh = det_nms_thresh
        dt = jnp.dtype(dtype)
        self.core = _FPNDetectorCore(arch, dtype=dt)
        self.box_head = FastRCNNConvFCHead(dtype=dt)
        self.box_predictor = BoxPredictor(dtype=dt)
        self.feat_proj = FeatureProjection(dtype=dt)
        self._strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
        self._grid_table = jnp.asarray(_grid_pad_table(image_size, num_regions))

    def init_params(self, rng: jax.Array):
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        dummy = jnp.zeros((1, *self.image_size, 3), jnp.float32)
        params = {
            "core": self.core.init(r1, dummy)["params"],
            "box_head": self.box_head.init(r2, jnp.zeros((1, 7, 7, 256)))["params"],
            "box_predictor": self.box_predictor.init(r3, jnp.zeros((1, 1024)))["params"],
            "feat_proj": self.feat_proj.init(r4, jnp.zeros((1, 256 * 7 * 7)))["params"],
        }
        if self.checkpoint or self.backbone_checkpoint:
            from multimodal_classification_tpu.extractors.convert import (
                convert_torchvision_frcnn_v2,
                convert_torchvision_resnet,
                merge_into,
            )
            from multimodal_classification_tpu.models.convert import load_torch_checkpoint

            if self.checkpoint:
                # full torchvision FasterRCNN checkpoint (R50-FPN-v2 COCO for
                # arch=resnet50; for resnet152 the body keys shape-mismatch
                # and only FPN/RPN/ROI-head weights graft — the reference's
                # _init_detection_head_from_resnet50, fasterrcnn_resnet152.py:237-280)
                sd = load_torch_checkpoint(self.checkpoint)
                loaded = convert_torchvision_frcnn_v2(sd, arch=self.arch)
                for part in ("core", "box_head", "box_predictor"):
                    if part in loaded:
                        params[part], n = merge_into(params[part], loaded[part])
            if self.backbone_checkpoint:
                # plain ImageNet torchvision resnet state dict for the body
                sd = load_torch_checkpoint(self.backbone_checkpoint)
                body = convert_torchvision_resnet(sd, self.arch, stages=4)
                params["core"]["body"], _ = merge_into(params["core"]["body"], body)
        return params

    def _detect(self, params, pyramid_i, rpn_out_i, anchors):
        """Full per-image detection pass (torchvision GeneralizedRCNN eval):
        returns (boxes [D, 4], scores [D]) sorted desc, -inf = invalid."""
        boxes_l, scores_l = [], []
        for name in ("p2", "p3", "p4", "p5", "p6"):
            logits, deltas = rpn_out_i[name]
            bx, sc, _valid = rpn_proposals(
                logits, deltas, anchors[name], self.image_size,
                pre_nms_top_n=self.rpn_pre_nms_top_n,
                post_nms_top_n=min(self.rpn_post_nms_top_n,
                                   logits.shape[0] * logits.shape[1] * 3),
                nms_thresh=0.7, min_size=1e-3,
            )
            boxes_l.append(bx)
            scores_l.append(sc)
        all_boxes = jnp.concatenate(boxes_l)
        all_scores = jnp.concatenate(scores_l)
        # filter_proposals' final step: global sort across levels, keep top-N
        k = min(self.rpn_post_nms_top_n, all_scores.shape[0])
        _top, idx = jax.lax.top_k(all_scores, k)
        proposals = all_boxes[idx]  # [P, 4]
        prop_valid = jnp.isfinite(_top)

        # ROI heads: pool → box head → class scores + per-class deltas
        pooled = multiscale_roi_align(pyramid_i, proposals, 7)  # [P, C, 7, 7]
        patches = jnp.transpose(pooled, (0, 2, 3, 1))  # NHWC for the conv head
        box_feats = self.box_head.apply({"params": params["box_head"]}, patches)
        cls_logits, deltas = self.box_predictor.apply(
            {"params": params["box_predictor"]}, box_feats
        )
        nc = cls_logits.shape[-1]
        probs = jax.nn.softmax(cls_logits, axis=-1)  # [P, NC]
        class_boxes = decode_deltas(
            proposals[:, None, :], deltas.reshape(-1, nc, 4),
            weights=(10.0, 10.0, 5.0, 5.0),
        )
        class_boxes = clip_boxes(class_boxes, *self.image_size)

        # postprocess_detections: drop background col 0, flatten class-box
        # pairs, score/min-size filter, per-class NMS, keep top detections
        scores_f = probs[:, 1:].reshape(-1)
        boxes_f = class_boxes[:, 1:].reshape(-1, 4)
        labels_f = jnp.tile(jnp.arange(1, nc), probs.shape[0])
        ws = boxes_f[:, 2] - boxes_f[:, 0]
        hs = boxes_f[:, 3] - boxes_f[:, 1]
        ok = (
            (scores_f > self.det_score_thresh)
            & (ws >= 1e-2) & (hs >= 1e-2)
            & jnp.repeat(prop_valid, nc - 1)
        )
        scores_f = jnp.where(ok, scores_f, -jnp.inf)
        k2 = min(self.det_pre_nms, scores_f.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores_f, k2)
        sel, valid = batched_nms(
            boxes_f[top_idx], top_scores, labels_f[top_idx],
            self.det_nms_thresh, self.num_regions,
        )
        sel_c = jnp.maximum(sel, 0)
        det_boxes = boxes_f[top_idx[sel_c]]
        det_scores = jnp.where(valid, top_scores[sel_c], -jnp.inf)
        return det_boxes, det_scores

    def _extract(self, params, images):
        b = images.shape[0]
        x = normalize_images(images)
        pyramid, rpn_out = self.core.apply({"params": params["core"]}, x)
        anchors = {
            name: jnp.asarray(generate_anchors_torchvision(
                rpn_out[name][0].shape[1], rpn_out[name][0].shape[2],
                self._strides[name], sizes=(FPN_ANCHOR_SIZES[name],),
                ratios=(0.5, 1.0, 2.0),
            ))
            for name in ("p2", "p3", "p4", "p5", "p6")
        }

        def per_image(i):
            pyramid_i = {n: pyramid[n][i] for n in ("p2", "p3", "p4", "p5")}
            rpn_i = {n: (rpn_out[n][0][i], rpn_out[n][1][i])
                     for n in ("p2", "p3", "p4", "p5", "p6")}
            det_boxes, det_scores = self._detect(params, pyramid_i, rpn_i, anchors)

            # keep detections ≥ confidence threshold (already sorted desc),
            # pad the remaining slots with the reference's dynamic grid
            keep = det_scores >= self.conf_thresh
            n_det = jnp.sum(keep.astype(jnp.int32))
            slots = jnp.arange(self.num_regions)
            grid_row = self._grid_table[self.num_regions - n_det]
            grid_idx = jnp.clip(slots - n_det, 0, self.num_regions - 1)
            use_grid = slots >= n_det
            boxes = jnp.where(use_grid[:, None], grid_row[grid_idx], det_boxes)

            # pool the FINAL padded box list (grid boxes get real pooled
            # features too — fasterrcnn.py:77-89 pools after padding)
            pooled = multiscale_roi_align(pyramid_i, boxes, 7)
            flat = pooled.reshape(pooled.shape[0], -1)
            feats = self.feat_proj.apply({"params": params["feat_proj"]}, flat)
            spatial = normalize_boxes_spatial_jnp(boxes, *self.image_size)
            return feats.astype(jnp.float32), spatial

        feats, spatial = jax.vmap(per_image)(jnp.arange(b))
        return feats, spatial


def normalize_boxes_spatial_jnp(boxes: jnp.ndarray, img_h: float, img_w: float):
    x1 = jnp.clip(boxes[:, 0] / img_w, 0, 1)
    y1 = jnp.clip(boxes[:, 1] / img_h, 0, 1)
    x2 = jnp.clip(boxes[:, 2] / img_w, 0, 1)
    y2 = jnp.clip(boxes[:, 3] / img_h, 0, 1)
    return jnp.stack([x1, y1, x2, y2, (x2 - x1) * (y2 - y1)], axis=-1)


# ---------------------------------------------------------------------------
# VG family (no FPN; stride-16 C4 trunk + layer4 top)
# ---------------------------------------------------------------------------


class VGClassifierHead(nn.Module):
    """1601-way Visual-Genome classifier over top features
    (reference fasterrcnn_vg.py RCNN_cls_score)."""

    num_classes: int = 1601
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        return nn.Dense(self.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
                        name="cls_score")(feats.astype(self.dtype))


class FasterRCNNVGExtractor(BaseExtractor):
    """Static proposals scored by the VG classifier (fasterrcnn_vg.py)."""

    feature_dim = 2048

    def __init__(
        self,
        num_regions: int = 36,
        image_size: int = 600,
        num_candidates: int = 300,
        checkpoint: Optional[str] = None,
        dtype: str = "bfloat16",
        **_kw,
    ):
        super().__init__()
        self.num_regions = num_regions
        self.image_size = (image_size, image_size)
        self.checkpoint = checkpoint
        self._loaded_heads: Dict[str, dict] = {}
        dt = jnp.dtype(dtype)
        self.base = ResNetTrunk(STAGE_BLOCKS["resnet101"], stages=3, dtype=dt)
        self.top = ResNetTop(STAGE_BLOCKS["resnet101"][3], dtype=dt)
        self.cls_head = VGClassifierHead(dtype=dt)
        cand = np.concatenate(
            [grid_proposals(image_size, image_size, 36),
             multi_scale_proposals(image_size, image_size)]
        )[:num_candidates]
        self._candidates = jnp.asarray(cand)
        self.num_candidates = len(cand)

    def init_params(self, rng: jax.Array):
        r1, r2, r3 = jax.random.split(rng, 3)
        dummy = jnp.zeros((1, *self.image_size, 3), jnp.float32)
        base_p = self.base.init(r1, dummy)["params"]
        top_p = self.top.init(r2, jnp.zeros((1, 14, 14, 1024), jnp.float32))["params"]
        cls_p = self.cls_head.init(r3, jnp.zeros((1, 2048)))["params"]
        params = {"base": base_p, "top": top_p, "cls": cls_p}
        if self.checkpoint:
            from multimodal_classification_tpu.extractors.convert import (
                convert_vg_heads,
                convert_vg_rcnn,
                merge_into,
            )
            from multimodal_classification_tpu.models.convert import load_torch_checkpoint

            sd = load_torch_checkpoint(self.checkpoint)
            trunk, top = convert_vg_rcnn(sd)
            params["base"], _ = merge_into(params["base"], trunk)
            params["top"], _ = merge_into(params["top"], top)
            heads = convert_vg_heads(sd)
            if "cls" in heads:
                params["cls"], _ = merge_into(params["cls"], heads["cls"])
            self._loaded_heads = heads
        return params

    def _region_feats(self, params, c4_chw, boxes):
        pooled = roi_pool(c4_chw, boxes, (14, 14), spatial_scale=1.0 / 16.0)
        patches = jnp.transpose(pooled, (0, 2, 3, 1))  # [R, 14, 14, 1024]
        return self.top.apply({"params": params["top"]}, patches)  # [R, 2048]

    def _extract(self, params, images):
        b = images.shape[0]
        x = normalize_images(images)
        c4 = self.base.apply({"params": params["base"]}, x)["c4"]
        chw = jnp.transpose(c4, (0, 3, 1, 2)).astype(jnp.float32)

        def per_image(feat_chw):
            feats = self._region_feats(params, feat_chw, self._candidates)
            logits = self.cls_head.apply({"params": params["cls"]}, feats)
            scores = jnp.max(jax.nn.softmax(logits, -1)[:, 1:], axis=-1)  # max non-bg
            sel, valid = nms(self._candidates, scores, 0.5, self.num_regions)
            sel_c = jnp.maximum(sel, 0)
            boxes = self._candidates[sel_c]
            out_feats = jnp.where(valid[:, None], feats[sel_c], 0.0)
            spatial = normalize_boxes_spatial_jnp(boxes, *self.image_size)
            spatial = jnp.where(valid[:, None], spatial, 0.0)
            return out_feats.astype(jnp.float32), spatial

        return jax.vmap(per_image)(chw)


class VGRPN(nn.Module):
    """The VG checkpoint's trained RPN head (fasterrcnn_vg_rpn.py:34-105):
    3×3 conv (512) → 1×1 cls (2A as bg/fg pairs) + 1×1 bbox (4A)."""

    num_anchors: int = 12
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.relu(
            nn.Conv(512, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="RPN_Conv")(x)
        )
        cls = nn.Conv(self.num_anchors * 2, (1, 1), dtype=jnp.float32,
                      param_dtype=jnp.float32, name="RPN_cls_score")(h)
        bbox = nn.Conv(self.num_anchors * 4, (1, 1), dtype=jnp.float32,
                       param_dtype=jnp.float32, name="RPN_bbox_pred")(h)
        return cls, bbox


class FasterRCNNVGRPNExtractor(FasterRCNNVGExtractor):
    """VG trunk + trained RPN (fasterrcnn_vg_rpn.py): anchors 4 scales ×
    3 ratios stride 16, decode/clip/min-size, pre-NMS 6000 → NMS 0.7 → 300,
    classifier rescore → top-36."""

    def __init__(
        self,
        num_regions: int = 36,
        image_size: int = 600,
        pre_nms_top_n: int = 6000,
        post_nms_top_n: int = 300,
        checkpoint: Optional[str] = None,
        dtype: str = "bfloat16",
        **_kw,
    ):
        super().__init__(num_regions=num_regions, image_size=image_size,
                         checkpoint=checkpoint, dtype=dtype)
        self.rpn = VGRPN(dtype=jnp.dtype(dtype))
        self.pre_nms_top_n = pre_nms_top_n
        self.post_nms_top_n = post_nms_top_n

    def _anchors_for(self, fh: int, fw: int) -> jnp.ndarray:
        # anchors must match the *actual* C4 map size (conv arithmetic rounds
        # up per stage; image_size//16 is wrong for e.g. 600 → 38, not 37)
        return jnp.asarray(
            generate_anchors(fh, fw, 16, scales=(64, 128, 256, 512),
                             ratios=(0.5, 1.0, 2.0))
        )

    def init_params(self, rng: jax.Array):
        params = super().init_params(rng)  # loads trunk/top/cls + stashes heads
        r = jax.random.fold_in(rng, 99)
        params["rpn"] = self.rpn.init(
            r, jnp.zeros((1, self.image_size[0] // 16, self.image_size[1] // 16, 1024))
        )["params"]
        if self._loaded_heads.get("rpn"):
            from multimodal_classification_tpu.extractors.convert import merge_into

            params["rpn"], n = merge_into(params["rpn"], self._loaded_heads["rpn"])
            if n == 0:
                raise ValueError(
                    f"checkpoint {self.checkpoint} has RPN keys but none matched"
                )
        return params

    def _extract(self, params, images):
        b = images.shape[0]
        x = normalize_images(images)
        c4 = self.base.apply({"params": params["base"]}, x)["c4"]
        cls, bbox = self.rpn.apply({"params": params["rpn"]}, c4)
        chw = jnp.transpose(c4, (0, 3, 1, 2)).astype(jnp.float32)
        anchors = self._anchors_for(c4.shape[1], c4.shape[2])

        def per_image(feat_chw, cls_i, bbox_i):
            a = anchors.shape[0] // (cls_i.shape[0] * cls_i.shape[1])
            # fg scores: the 2A channels are A consecutive (bg, fg) pairs —
            # the reference permutes to [H, W, 2A] then view(-1, 2) and
            # softmaxes each pair (fasterrcnn_vg_rpn.py:80-85); this pairing
            # must match the trained head's channel order
            pairs = cls_i.reshape(-1, 2)  # [H*W*A, 2]
            fg = jax.nn.softmax(pairs, axis=-1)[:, 1]
            boxes, scores, valid = rpn_proposals(
                fg.reshape(cls_i.shape[0], cls_i.shape[1], a),
                bbox_i, anchors, self.image_size,
                self.pre_nms_top_n, self.post_nms_top_n, 0.7, min_size=16.0,
            )
            feats = self._region_feats(params, feat_chw, boxes)
            logits = self.cls_head.apply({"params": params["cls"]}, feats)
            rescored = jnp.max(jax.nn.softmax(logits, -1)[:, 1:], axis=-1)
            rescored = jnp.where(valid, rescored, -jnp.inf)
            top_scores, idx = jax.lax.top_k(rescored, self.num_regions)
            ok = jnp.isfinite(top_scores)
            out_feats = jnp.where(ok[:, None], feats[idx], 0.0)
            spatial = normalize_boxes_spatial_jnp(boxes[idx], *self.image_size)
            spatial = jnp.where(ok[:, None], spatial, 0.0)
            return out_feats.astype(jnp.float32), spatial

        return jax.vmap(per_image)(chw, cls, bbox)


# ---------------------------------------------------------------------------
# X-152++ grid features (detectron2 GeneralizedRCNN w/ Res5ROIHeads)
# ---------------------------------------------------------------------------


class GridFeatsX152Extractor(BaseExtractor):
    """ResNeXt-152 32×8d C4 trunk → RPN → ROIAlignV2(14×14) → Res5 → pooled
    2048 (reference grid_feats_x152.py:98-219: sigmoid objectness ≥ 0.2,
    top-100, zero-pad)."""

    feature_dim = 2048

    def __init__(
        self,
        num_regions: int = 100,
        image_size: int = 448,
        confidence_threshold: float = 0.2,
        checkpoint: Optional[str] = None,
        dtype: str = "bfloat16",
        **_kw,
    ):
        super().__init__()
        self.num_regions = num_regions
        self.image_size = (image_size, image_size)
        self.conf_thresh = confidence_threshold
        self.checkpoint = checkpoint
        dt = jnp.dtype(dtype)
        self.base = ResNetTrunk(STAGE_BLOCKS["resnet152"], stages=3, dtype=dt,
                                groups=32, base_width=8)
        self.top = ResNetTop(STAGE_BLOCKS["resnet152"][3], dtype=dt,
                             groups=32, base_width=8)
        self.rpn = RPNHead(num_anchors=15, in_channels=1024, dtype=dt)

    def init_params(self, rng: jax.Array):
        r1, r2, r3 = jax.random.split(rng, 3)
        dummy = jnp.zeros((1, *self.image_size, 3), jnp.float32)
        base_p = self.base.init(r1, dummy)["params"]
        top_p = self.top.init(r2, jnp.zeros((1, 14, 14, 1024), jnp.float32))["params"]
        rpn_p = self.rpn.init(
            r3, jnp.zeros((1, self.image_size[0] // 16, self.image_size[1] // 16, 1024))
        )["params"]
        params = {"base": base_p, "top": top_p, "rpn": rpn_p}
        if self.checkpoint:
            # X-152++ detectron2 checkpoint (reference grid_feats_x152.py:29-43)
            from multimodal_classification_tpu.extractors.convert import (
                convert_detectron2_rcnn,
                merge_into,
            )
            from multimodal_classification_tpu.models.convert import load_torch_checkpoint

            sd = load_torch_checkpoint(self.checkpoint)
            loaded = convert_detectron2_rcnn(sd)
            for part in ("base", "top", "rpn"):
                if part in loaded:
                    params[part], _ = merge_into(params[part], loaded[part])
        return params

    def _extract(self, params, images):
        x = normalize_images(images)
        c4 = self.base.apply({"params": params["base"]}, x)["c4"]
        logits, deltas = self.rpn.apply({"params": params["rpn"]}, c4)
        chw = jnp.transpose(c4, (0, 3, 1, 2)).astype(jnp.float32)
        # anchors from the actual C4 grid (conv rounding ≠ image_size//16);
        # detectron2 DefaultAnchorGenerator: offset 0, scale-major
        anchors = jnp.asarray(
            generate_anchors(c4.shape[1], c4.shape[2], 16,
                             scales=(32, 64, 128, 256, 512), ratios=(0.5, 1.0, 2.0),
                             offset=0.0)
        )

        def per_image(feat_chw, logits_i, deltas_i):
            boxes, scores, valid = rpn_proposals(
                logits_i, deltas_i, anchors, self.image_size,
                pre_nms_top_n=2000, post_nms_top_n=self.num_regions, nms_thresh=0.7,
            )
            obj = jax.nn.sigmoid(scores)
            keep = valid & (obj >= self.conf_thresh)
            pooled = roi_align(
                feat_chw, boxes, (14, 14), spatial_scale=1.0 / 16.0,
                sampling_ratio=2, aligned=True,  # ROIAlignV2
            )
            patches = jnp.transpose(pooled, (0, 2, 3, 1))
            feats = self.top.apply({"params": params["top"]}, patches)
            feats = jnp.where(keep[:, None], feats, 0.0)  # zero-pad
            spatial = normalize_boxes_spatial_jnp(boxes, *self.image_size)
            spatial = jnp.where(keep[:, None], spatial, 0.0)
            return feats.astype(jnp.float32), spatial

        return jax.vmap(per_image)(chw, logits, deltas)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------


@register_feature_extractor("fasterrcnn")
def _make_fasterrcnn(**kw):
    kw.setdefault("arch", "resnet50")
    return FasterRCNNFPNExtractor(**kw)


@register_feature_extractor("fasterrcnn_resnet152")
def _make_fasterrcnn_r152(**kw):
    kw.setdefault("arch", "resnet152")
    return FasterRCNNFPNExtractor(**kw)


@register_feature_extractor("fasterrcnn_vg")
def _make_fasterrcnn_vg(**kw):
    return FasterRCNNVGExtractor(**kw)


@register_feature_extractor("fasterrcnn_vg_rpn")
def _make_fasterrcnn_vg_rpn(**kw):
    return FasterRCNNVGRPNExtractor(**kw)


@register_feature_extractor("grid_x152")
def _make_grid_x152(**kw):
    return GridFeatsX152Extractor(**kw)


@register_feature_extractor("grid_x152_standard")
def _make_grid_x152_standard(**kw):
    kw.setdefault("confidence_threshold", 0.0)
    return GridFeatsX152Extractor(**kw)
