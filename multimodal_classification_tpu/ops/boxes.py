"""Box utilities: IoU, anchors, delta decode, clipping, spatial encodings.

Static-shape, fully-vectorised replacements for the reference's torchvision
box ops and hand-rolled anchor/RPN math
(reference: feature_extractors/fasterrcnn_vg_rpn.py:106-175 anchors/deltas,
models/base.py:244-269 grid spatial, resnet152_roi.py:295-311 normalisation).
Boxes are (x1, y1, x2, y2) in pixels unless noted.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

# RPN delta-decode clamp: log(1000/16), same bound torchvision uses and the
# reference replicates (fasterrcnn_vg_rpn.py:141-175).
BBOX_XFORM_CLIP = float(np.log(1000.0 / 16.0))


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] → [...] area; degenerate boxes clamp to 0."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU. a: [N, 4], b: [M, 4] → [N, M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def clip_boxes(boxes: jnp.ndarray, height: float, width: float) -> jnp.ndarray:
    """Clip to [0, W]×[0, H] (torchvision clip_boxes_to_image semantics)."""
    x1 = jnp.clip(boxes[..., 0], 0.0, width)
    y1 = jnp.clip(boxes[..., 1], 0.0, height)
    x2 = jnp.clip(boxes[..., 2], 0.0, width)
    y2 = jnp.clip(boxes[..., 3], 0.0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def decode_deltas(
    anchors: jnp.ndarray,
    deltas: jnp.ndarray,
    weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Apply (dx, dy, dw, dh) regression deltas to anchors.

    Exp is clamped at log(1000/16) — matches the reference's RPN decode
    (fasterrcnn_vg_rpn.py:141-175) and torchvision's BoxCoder. ``weights``
    divide the raw deltas first (torchvision's ROI-head BoxCoder uses
    (10, 10, 5, 5); RPNs use unit weights).
    anchors/deltas: [..., 4] → boxes [..., 4].
    """
    widths = anchors[..., 2] - anchors[..., 0]
    heights = anchors[..., 3] - anchors[..., 1]
    ctr_x = anchors[..., 0] + 0.5 * widths
    ctr_y = anchors[..., 1] + 0.5 * heights

    dx, dy, dw, dh = (deltas[..., i] / weights[i] for i in range(4))
    dw = jnp.clip(dw, a_max=BBOX_XFORM_CLIP)
    dh = jnp.clip(dh, a_max=BBOX_XFORM_CLIP)

    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights

    return jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w,
            pred_ctr_y + 0.5 * pred_h,
        ],
        axis=-1,
    )


def generate_anchors(
    feat_height: int,
    feat_width: int,
    stride: int = 16,
    scales: Sequence[float] = (64, 128, 256, 512),
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
    offset: float = 0.5,
) -> np.ndarray:
    """Dense anchor grid, centred per cell: [H*W*A, 4], numpy (static).

    Matches the reference RPN's meshgrid construction
    (fasterrcnn_vg_rpn.py:106-140): A = len(scales)·len(ratios) anchors per
    cell, scale-major / ratio-minor within cell (the reference's
    ``for scale: for ratio:`` loop order — this pairing must match the
    trained RPN head's output-channel order), cells row-major.
    """
    scales = np.asarray(scales, np.float32)
    ratios = np.asarray(ratios, np.float32)
    # base anchors centred at (stride/2, stride/2); [scale, ratio] → flat
    ws = (scales[:, None] * np.sqrt(1.0 / ratios)[None, :]).reshape(-1)  # [A]
    hs = (scales[:, None] * np.sqrt(ratios)[None, :]).reshape(-1)
    base = np.stack([-ws / 2, -hs / 2, ws / 2, hs / 2], axis=-1)  # [A, 4]

    # cell-centre offset: 0.5 = the reference RPN's ``+ stride // 2``
    # (fasterrcnn_vg_rpn.py:120-127); detectron2's DefaultAnchorGenerator
    # uses offset 0.0 (grid origins) — pass 0.0 for the X-152++ path.
    shift_x = (np.arange(feat_width, dtype=np.float32) + offset) * stride
    shift_y = (np.arange(feat_height, dtype=np.float32) + offset) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)  # [H, W]
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)  # [H*W, 1, 4]
    return (shifts + base[None]).reshape(-1, 4).astype(np.float32)


def generate_anchors_torchvision(
    feat_height: int,
    feat_width: int,
    stride: int,
    sizes: Sequence[float],
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """torchvision ``AnchorGenerator`` semantics → [H*W*A, 4], numpy.

    Differs from :func:`generate_anchors` (the reference's hand-rolled VG
    RPN) in three ways that matter once COCO-trained RPN weights are loaded:
    cell origins at ``i*stride`` (no half-cell centring), base anchors
    ``round()``-ed, and ratio-major ordering
    (``ws = (w_ratios[:, None] * scales[None, :]).view(-1)``).
    """
    sizes = np.asarray(sizes, np.float32)
    ratios = np.asarray(ratios, np.float32)
    h_ratios = np.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    ws = (w_ratios[:, None] * sizes[None, :]).reshape(-1)  # ratio-major
    hs = (h_ratios[:, None] * sizes[None, :]).reshape(-1)
    base = np.round(np.stack([-ws, -hs, ws, hs], axis=-1) / 2.0)  # [A, 4]

    shift_x = np.arange(feat_width, dtype=np.float32) * stride
    shift_y = np.arange(feat_height, dtype=np.float32) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4).astype(np.float32)


def generate_grid_boxes(
    grid: int, height: float, width: float
) -> np.ndarray:
    """grid×grid tiling of the image → [grid², 4] pixel boxes (row-major)."""
    ys = np.linspace(0.0, height, grid + 1, dtype=np.float32)
    xs = np.linspace(0.0, width, grid + 1, dtype=np.float32)
    boxes = [
        (xs[j], ys[i], xs[j + 1], ys[i + 1])
        for i in range(grid)
        for j in range(grid)
    ]
    return np.asarray(boxes, np.float32)


def normalize_boxes(
    boxes: jnp.ndarray, height: float, width: float
) -> jnp.ndarray:
    """Pixel boxes → 5-dim spatial encoding (x1, y1, x2, y2, area), all
    normalised to [0, 1] — the uniform extractor→ViLBERT interface
    (reference: models/base.py:214-227, resnet152_roi.py:295-311)."""
    x1 = boxes[..., 0] / width
    y1 = boxes[..., 1] / height
    x2 = boxes[..., 2] / width
    y2 = boxes[..., 3] / height
    area = (x2 - x1) * (y2 - y1)
    return jnp.stack([x1, y1, x2, y2, area], axis=-1)


def grid_spatial(grid: int) -> np.ndarray:
    """Normalised spatial encoding for a grid×grid tiling → [grid², 5]
    (reference: models/base.py:244-269 _generate_grid_spatial)."""
    boxes = generate_grid_boxes(grid, 1.0, 1.0)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return np.concatenate([boxes, area[:, None]], axis=-1).astype(np.float32)
