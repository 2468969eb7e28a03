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
)
from multimodal_classification_tpu.ops.nms import nms
from multimodal_classification_tpu.ops.roi import roi_align, roi_pool
from multimodal_classification_tpu.registry import register_feature_extractor


# ---------------------------------------------------------------------------
# FPN
# ---------------------------------------------------------------------------


class FPN(nn.Module):
    """Lateral 1×1 + top-down 2× upsample + 3×3 output convs → P2..P5 (+P6
    via stride-2 maxpool), 256 channels (torchvision FPN semantics —
    reference fasterrcnn_resnet152.py:34-100 hand-assembles the same)."""

    out_channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        names = ["c2", "c3", "c4", "c5"]
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"lateral_{n}")(feats[n])
            for n in names
        ]
        outs = {}
        prev = laterals[-1]
        for i in range(len(names) - 1, -1, -1):
            if i < len(names) - 1:
                up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
                up = up[:, : laterals[i].shape[1], : laterals[i].shape[2], :]
                prev = laterals[i] + up
            outs[f"p{i + 2}"] = nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                dtype=self.dtype, param_dtype=jnp.float32, name=f"output_{names[i]}",
            )(prev)
        outs["p6"] = nn.max_pool(outs["p5"], (1, 1), strides=(2, 2))
        return outs


class RPNHead(nn.Module):
    """Shared 3×3 conv + 1×1 objectness / 1×1 box-delta heads."""

    num_anchors: int
    in_channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.relu(
            nn.Conv(self.in_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
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
        head = RPNHead(num_anchors=3, dtype=self.dtype, name="rpn_head")
        rpn_out = {name: head(pyramid[name]) for name in ("p2", "p3", "p4", "p5", "p6")}
        return pyramid, rpn_out


class _BoxHead(nn.Module):
    """TwoMLPHead + class scores + 2048-proj (the reference pools 256·7·7 and
    projects with its own MLP, fasterrcnn.py:81-89)."""

    num_classes: int = 91
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled_flat: jnp.ndarray):
        h = nn.relu(nn.Dense(1024, dtype=self.dtype, param_dtype=jnp.float32,
                             name="fc6")(pooled_flat))
        h = nn.relu(nn.Dense(1024, dtype=self.dtype, param_dtype=jnp.float32,
                             name="fc7")(h))
        cls = nn.Dense(self.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
                       name="cls_score")(h)
        proj = nn.relu(nn.Dense(2048, dtype=self.dtype, param_dtype=jnp.float32,
                                name="feat_proj")(pooled_flat))
        return cls, proj


# per-level anchor scales for FPN RPN (torchvision: one size per level, 3 ratios)
FPN_ANCHOR_SIZES = {"p2": 32, "p3": 64, "p4": 128, "p5": 256, "p6": 512}


class FasterRCNNFPNExtractor(BaseExtractor):
    feature_dim = 2048

    def __init__(
        self,
        arch: str = "resnet50",
        num_regions: int = 36,
        image_size: int = 800,
        confidence_threshold: float = 0.2,
        checkpoint: Optional[str] = None,
        dtype: str = "bfloat16",
        **_kw,
    ):
        super().__init__()
        self.arch = arch
        self.num_regions = num_regions
        self.image_size = (image_size, image_size)
        self.conf_thresh = confidence_threshold
        self.checkpoint = checkpoint
        dt = jnp.dtype(dtype)
        self.core = _FPNDetectorCore(arch, dtype=dt)
        self.box_head = _BoxHead(dtype=dt)
        self._strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
        self._grid_pad = jnp.asarray(grid_proposals(image_size, image_size, num_regions))

    def init_params(self, rng: jax.Array):
        r1, r2 = jax.random.split(rng)
        dummy = jnp.zeros((1, *self.image_size, 3), jnp.float32)
        core_params = self.core.init(r1, dummy)["params"]
        head_params = self.box_head.init(r2, jnp.zeros((1, 256 * 7 * 7)))["params"]
        return {"core": core_params, "box_head": head_params}

    def _extract(self, params, images):
        b = images.shape[0]
        x = normalize_images(images)
        pyramid, rpn_out = self.core.apply({"params": params["core"]}, x)
        # anchors from actual per-level grids (conv rounding ≠ image_size//stride)
        anchors = {
            name: jnp.asarray(generate_anchors(
                rpn_out[name][0].shape[1], rpn_out[name][0].shape[2],
                self._strides[name], scales=(FPN_ANCHOR_SIZES[name],),
                ratios=(0.5, 1.0, 2.0),
            ))
            for name in ("p2", "p3", "p4", "p5", "p6")
        }

        def per_image(i):
            boxes_l, scores_l = [], []
            for name in ("p2", "p3", "p4", "p5", "p6"):
                logits, deltas = rpn_out[name]
                bx, sc, _valid = rpn_proposals(
                    logits[i], deltas[i], anchors[name],
                    self.image_size, pre_nms_top_n=1000, post_nms_top_n=100,
                )
                boxes_l.append(bx)
                scores_l.append(sc)
            boxes = jnp.concatenate(boxes_l)  # [500, 4]
            scores = jnp.concatenate(scores_l)
            # pool + classify all surviving proposals, then pick top regions
            # by max-class confidence (reference keeps boxes ≥0.2 conf and
            # pads with grid boxes, fasterrcnn.py:59-118)
            level_feats = {n: pyramid[n][i] for n in ("p2", "p3", "p4", "p5")}
            pooled = multiscale_roi_align(level_feats, boxes, 7)  # [N, C, 7, 7]
            flat = pooled.reshape(pooled.shape[0], -1)
            cls, proj = self.box_head.apply({"params": params["box_head"]}, flat)
            probs = jax.nn.softmax(cls, axis=-1)
            conf = jnp.max(probs[:, 1:], axis=-1)  # drop background col 0
            conf = jnp.where(jnp.isfinite(scores), conf, -jnp.inf)
            above = conf >= self.conf_thresh
            ranked = jnp.where(above, conf, conf - 10.0)  # below-thresh sink
            top_conf, top_idx = jax.lax.top_k(ranked, self.num_regions)
            sel_boxes = boxes[top_idx]
            sel_feats = proj[top_idx]
            # grid-box padding for sunk slots
            use_grid = top_conf < (self.conf_thresh - 5.0)
            sel_boxes = jnp.where(use_grid[:, None], self._grid_pad, sel_boxes)
            sel_feats = jnp.where(use_grid[:, None], 0.0, sel_feats)
            spatial = normalize_boxes_spatial_jnp(sel_boxes, *self.image_size)
            return sel_feats.astype(jnp.float32), spatial

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
                convert_vg_rcnn,
                merge_into,
            )
            from multimodal_classification_tpu.models.convert import load_torch_checkpoint

            sd = load_torch_checkpoint(self.checkpoint)
            trunk, top = convert_vg_rcnn(sd)
            params["base"], _ = merge_into(params["base"], trunk)
            params["top"], _ = merge_into(params["top"], top)
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
        params = super().init_params(rng)
        r = jax.random.fold_in(rng, 99)
        params["rpn"] = self.rpn.init(
            r, jnp.zeros((1, self.image_size[0] // 16, self.image_size[1] // 16, 1024))
        )["params"]
        # (RPN weights load from the VG checkpoint keys RPN_Conv/RPN_cls_score/
        # RPN_bbox_pred when a checkpoint is provided)
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
            # fg scores: second half of the 2A channels (bg/fg layout)
            scores2 = cls_i.reshape(-1, 2 * a)
            fg = jax.nn.softmax(
                jnp.stack([scores2[:, :a], scores2[:, a:]], -1), axis=-1
            )[..., 1].reshape(-1)
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
        return {"base": base_p, "top": top_p, "rpn": rpn_p}

    def _extract(self, params, images):
        x = normalize_images(images)
        c4 = self.base.apply({"params": params["base"]}, x)["c4"]
        logits, deltas = self.rpn.apply({"params": params["rpn"]}, c4)
        chw = jnp.transpose(c4, (0, 3, 1, 2)).astype(jnp.float32)
        # anchors from the actual C4 grid (conv rounding ≠ image_size//16)
        anchors = jnp.asarray(
            generate_anchors(c4.shape[1], c4.shape[2], 16,
                             scales=(32, 64, 128, 256, 512), ratios=(0.5, 1.0, 2.0))
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
