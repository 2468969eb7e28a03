"""Visual feature-extractor layer: contracts + preprocessing.

The reference defines ``BaseFeatureExtractor.extract_features(PIL.Image) →
(features [N, 2048], spatial [N, 5])`` and loops it per image even in batch
forward (reference: models/base.py:183-269; the per-image loop at
resnet.py:78-85 is its single biggest performance bug — SURVEY.md §7e).

TPU-first contract: extractors are **batched, jitted functions**
``extract_batch(images [B, H, W, 3] float32 in [0,1]) → (features
[B, N, F], spatial [B, N, 5])`` with static shapes. The per-image
reference API is provided as a convenience wrapper.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_classification_tpu.ops.pooling import bilinear_resize

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def normalize_images(
    images: jnp.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD
) -> jnp.ndarray:
    """[B, H, W, 3] in [0,1] → normalized."""
    return (images - jnp.asarray(mean)) / jnp.asarray(std)


def resize_images(images: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize NHWC batch (torch F.interpolate semantics)."""
    x = jnp.transpose(images, (0, 3, 1, 2))
    x = bilinear_resize(x, size)
    return jnp.transpose(x, (0, 2, 3, 1))


def load_image(path: str, size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """PIL image file → [H, W, 3] float32 in [0,1] (host-side)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize((size[1], size[0]), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


class BaseExtractor:
    """Batched extractor base. Subclasses set ``num_regions``/``feature_dim``,
    implement ``_extract(images)`` (jitted), and may override ``image_size``."""

    num_regions: int = 36
    feature_dim: int = 2048
    image_size: Tuple[int, int] = (224, 224)

    def __init__(self):
        self._jitted = None

    def init_params(self, rng: jax.Array):
        raise NotImplementedError

    def _extract(self, params, images: jnp.ndarray):
        raise NotImplementedError

    def extract_batch(self, params, images: jnp.ndarray):
        """images [B, H, W, 3] in [0,1] at self.image_size → (feats, spatial)."""
        if self._jitted is None:
            self._jitted = jax.jit(self._extract)
        return self._jitted(params, images)

    def extract_features(self, params, pil_image):
        """Reference-parity per-image API (models/base.py:214-227)."""
        arr = np.asarray(pil_image.convert("RGB"), np.float32) / 255.0
        images = resize_images(jnp.asarray(arr)[None], self.image_size)
        feats, spatial = self.extract_batch(params, images)
        return np.asarray(feats[0]), np.asarray(spatial[0])
