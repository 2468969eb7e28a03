"""ROI feature pooling: RoIAlign and RoIPool, TPU-native.

Replaces torchvision ``RoIPool`` (reference: resnet152_roi.py:126,
fasterrcnn_vg.py:241) and ``MultiScaleRoIAlign``/ROIAlignV2
(fasterrcnn_resnet152.py:130-134, grid_feats_x152.py cfg).

TPU-first design: bilinear sampling + in-bin averaging is a *linear* operator
per axis, so RoIAlign is computed as two batched matmuls
``out[r] = My[r] @ f @ Mx[r]ᵀ`` with per-ROI interpolation matrices built on
device from the box coordinates — no gathers, all MXU work, static shapes.
RoIPool (max) uses separable masked reductions.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _align_axis_matrix(
    start: jnp.ndarray,  # [R] roi start coordinate (already scaled)
    size: jnp.ndarray,  # [R] roi extent (already scaled)
    out_size: int,
    sampling_ratio: int,
    in_size: int,
) -> jnp.ndarray:
    """Per-ROI [R, out, in] matrix: bilinear sampling at ``sampling_ratio``
    points per bin, averaged — torchvision RoIAlign semantics along one axis."""
    r = start.shape[0]
    s = sampling_ratio
    bin_size = size / out_size  # [R]
    # sample coordinates: start + (p*S + k + 0.5) * bin/S   for p∈[P), k∈[S)
    p_idx = jnp.arange(out_size, dtype=jnp.float32)  # [P]
    k_idx = jnp.arange(s, dtype=jnp.float32)  # [S]
    offs = p_idx[:, None] + (k_idx[None, :] + 0.5) / s  # [P, S] in bin units
    coords = start[:, None, None] + offs[None] * bin_size[:, None, None]  # [R,P,S]

    # torchvision boundary rule: sample is zero outside [-1, in_size];
    # inside, clamp to [0, in_size-1] before taking floor.
    in_range = (coords >= -1.0) & (coords <= in_size)
    c = jnp.clip(coords, 0.0, in_size - 1)
    lo = jnp.floor(c)
    frac = c - lo
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, in_size - 1)

    grid = jnp.arange(in_size, dtype=jnp.int32)  # [in]
    w_lo = jnp.where(in_range, 1.0 - frac, 0.0)
    w_hi = jnp.where(in_range, frac, 0.0)
    # dense scatter via comparison (R·P·S·in is tiny for region features)
    m = (lo_i[..., None] == grid) * w_lo[..., None] + (
        hi_i[..., None] == grid
    ) * w_hi[..., None]  # [R, P, S, in]
    return jnp.sum(m, axis=2) / s  # average over samples → [R, P, in]


@partial(
    jax.jit, static_argnames=("output_size", "spatial_scale", "sampling_ratio", "aligned")
)
def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: Tuple[int, int],
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = False,
) -> jnp.ndarray:
    """RoIAlign.

    Args:
      features: [C, H, W] feature map.
      boxes: [R, 4] (x1, y1, x2, y2) in input-image pixels.
      output_size: (P, Q) output bins.
      spatial_scale: feature-map stride reciprocal (e.g. 1/16).
      sampling_ratio: static samples-per-bin per axis (must be ≥ 1; the
        torchvision adaptive mode would be a dynamic shape).
      aligned: True = ROIAlignV2 half-pixel alignment (detectron2 default).

    Returns: [R, C, P, Q].
    """
    assert sampling_ratio >= 1, "adaptive sampling_ratio is dynamic-shape; pass >= 1"
    c, h, w = features.shape
    p, q = output_size
    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 0] * spatial_scale - offset
    y1 = boxes[:, 1] * spatial_scale - offset
    x2 = boxes[:, 2] * spatial_scale - offset
    y2 = boxes[:, 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:  # legacy: force malformed ROIs to be 1x1
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    my = _align_axis_matrix(y1, roi_h, p, sampling_ratio, h)  # [R, P, H]
    mx = _align_axis_matrix(x1, roi_w, q, sampling_ratio, w)  # [R, Q, W]
    f32 = features.astype(jnp.float32)
    tmp = jnp.einsum("rph,chw->rcpw", my, f32, preferred_element_type=jnp.float32)
    out = jnp.einsum("rcpw,rqw->rcpq", tmp, mx, preferred_element_type=jnp.float32)
    return out.astype(features.dtype)


def _pool_axis_mask(
    start: jnp.ndarray, end: jnp.ndarray, out_size: int, in_size: int
) -> jnp.ndarray:
    """[R, out, in] boolean masks with torchvision RoIPool bin semantics:
    bin p covers [floor(start + p·bin), ceil(start + (p+1)·bin)) ∩ [0, in).

    start/end are integral (already rounded), so the boundaries are exact
    rationals — computed in int32 (floor(p·L/P) = p·L//P) to avoid the fp32
    ULP fragility of floor/ceil at exact-integer boundaries.
    """
    s = start.astype(jnp.int32)
    length = end.astype(jnp.int32) - s  # [R]
    p_idx = jnp.arange(out_size, dtype=jnp.int32)
    lo = s[:, None] + (p_idx[None] * length[:, None]) // out_size
    num = (p_idx[None] + 1) * length[:, None]
    hi = s[:, None] + -((-num) // out_size)  # ceil division
    lo = jnp.clip(lo, 0, in_size)
    hi = jnp.clip(hi, 0, in_size)
    grid = jnp.arange(in_size, dtype=jnp.int32)
    return (grid >= lo[..., None]) & (grid < hi[..., None])  # [R, out, in]


@partial(jax.jit, static_argnames=("output_size", "spatial_scale"))
def roi_pool(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: Tuple[int, int],
    spatial_scale: float = 1.0,
) -> jnp.ndarray:
    """RoIPool (max-pooling) — torchvision semantics: box coords are scaled
    then rounded, bins use floor/ceil boundaries, empty bins yield 0.

    features: [C, H, W]; boxes: [R, 4] image pixels → [R, C, P, Q].
    """
    c, h, w = features.shape
    p, q = output_size
    x1 = jnp.round(boxes[:, 0] * spatial_scale)
    y1 = jnp.round(boxes[:, 1] * spatial_scale)
    x2 = jnp.round(boxes[:, 2] * spatial_scale)
    y2 = jnp.round(boxes[:, 3] * spatial_scale)
    # torchvision forces rois to be at least 1 cell
    x2 = jnp.maximum(x2, x1 + 1.0)
    y2 = jnp.maximum(y2, y1 + 1.0)

    mask_y = _pool_axis_mask(y1, y2, p, h)  # [R, P, H]
    mask_x = _pool_axis_mask(x1, x2, q, w)  # [R, Q, W]
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    f32 = features.astype(jnp.float32)

    def per_roi(my, mx):
        # [C, H, Q]
        t = jnp.max(jnp.where(mx[None, None, :, :], f32[:, :, None, :], neg), axis=-1)
        # [C, P, Q]
        o = jnp.max(jnp.where(my[None, :, :, None], t[:, None, :, :], neg), axis=-2)
        return jnp.where(jnp.isfinite(o), o, 0.0)

    out = jax.vmap(per_roi)(mask_y, mask_x)
    return out.astype(features.dtype)
