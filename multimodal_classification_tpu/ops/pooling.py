"""Pooling and resampling as dense linear maps.

TPU-first design note: adaptive average pooling and bilinear resizing are
*linear* operators along each spatial axis, so instead of gather-based
implementations (how torch does it on GPU — reference uses
``AdaptiveAvgPool2d`` in resnet.py:52-76 and ``F.interpolate`` in
dinov2.py:293-298 / clip.py:168-173) we materialise the tiny [out, in]
interpolation matrices once (numpy, static) and apply them as two einsums.
That keeps the whole op on the MXU with zero dynamic indexing.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _adaptive_avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] averaging matrix with torch AdaptiveAvgPool semantics:
    bin i covers [floor(i·H/P), ceil((i+1)·H/P))."""
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


@lru_cache(maxsize=64)
def _adaptive_bin_mask(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] boolean bin-membership mask (same bins as above)."""
    m = np.zeros((out_size, in_size), bool)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)
        m[i, start:end] = True
    return m


@lru_cache(maxsize=64)
def _bilinear_matrix(
    in_size: int, out_size: int, align_corners: bool = False
) -> np.ndarray:
    """[out, in] 1-D bilinear interpolation matrix (torch F.interpolate
    semantics; default half-pixel centres)."""
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        if align_corners and out_size > 1:
            src = i * (in_size - 1) / (out_size - 1)
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
        src = min(max(src, 0.0), in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


def adaptive_avg_pool2d(x: jnp.ndarray, output_size: Tuple[int, int]) -> jnp.ndarray:
    """x: [..., H, W] → [..., P, Q]. Exact torch AdaptiveAvgPool2d."""
    p, q = output_size
    h, w = x.shape[-2], x.shape[-1]
    mr = jnp.asarray(_adaptive_avg_matrix(h, p))
    mc = jnp.asarray(_adaptive_avg_matrix(w, q))
    y = jnp.einsum("ph,...hw->...pw", mr, x, preferred_element_type=x.dtype)
    return jnp.einsum("qw,...pw->...pq", mc, y, preferred_element_type=x.dtype)


def adaptive_max_pool2d(x: jnp.ndarray, output_size: Tuple[int, int]) -> jnp.ndarray:
    """x: [..., H, W] → [..., P, Q]. Max is not linear, so use separable
    masked reductions (still static-shape, VPU-friendly)."""
    p, q = output_size
    h, w = x.shape[-2], x.shape[-1]
    mask_c = jnp.asarray(_adaptive_bin_mask(w, q))  # [Q, W]
    neg = jnp.asarray(-jnp.inf, x.dtype)
    # [..., H, Q]
    y = jnp.max(jnp.where(mask_c, x[..., None, :], neg), axis=-1)
    mask_r = jnp.asarray(_adaptive_bin_mask(h, p))  # [P, H]
    # [..., P, Q]
    return jnp.max(jnp.where(mask_r[:, :, None], y[..., None, :, :], neg), axis=-2)


def bilinear_resize(
    x: jnp.ndarray, output_size: Tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """x: [..., H, W] → [..., P, Q]; exact torch F.interpolate(bilinear)."""
    p, q = output_size
    h, w = x.shape[-2], x.shape[-1]
    mr = jnp.asarray(_bilinear_matrix(h, p, align_corners), x.dtype)
    mc = jnp.asarray(_bilinear_matrix(w, q, align_corners), x.dtype)
    y = jnp.einsum("ph,...hw->...pw", mr, x)
    return jnp.einsum("qw,...pw->...pq", mc, y)
