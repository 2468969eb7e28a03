"""Classification losses as pure functions (logits fp32, labels int).

Same five-loss surface as the reference factory
(reference: pipelines/model_training/losses.py:15-242): ce / focal /
label_smoothing / focal_smoothing / weighted. All support an optional
per-example ``weights`` mask (used for padded eval batches — the reference,
single-device with drop_last=False, never needed this).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from multimodal_classification_tpu.registry import LOSS_REGISTRY, register_loss

LossFn = Callable[..., jnp.ndarray]


def _reduce(per_example: jnp.ndarray, weights: Optional[jnp.ndarray]) -> jnp.ndarray:
    if weights is None:
        return jnp.mean(per_example)
    w = weights.astype(per_example.dtype)
    return jnp.sum(per_example * w) / jnp.maximum(jnp.sum(w), 1.0)


def _log_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def _nll(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = _log_softmax(logits)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


@register_loss("ce")
def cross_entropy(**_kw) -> LossFn:
    def loss(logits, labels, weights=None):
        return _reduce(_nll(logits, labels), weights)

    return loss


@register_loss("focal")
def focal_loss(alpha: float = 0.35, gamma: float = 2.0, **_kw) -> LossFn:
    """Focal loss, exact reference semantics (losses.py:15-66): per-example
    CE, pt = exp(−ce), weight = alpha_t·(1−pt)^γ with
    alpha_t = α·y + (1−α)·(1−y) (binary labels)."""

    def loss(logits, labels, weights=None):
        ce = _nll(logits, labels)
        pt = jnp.exp(-ce)
        focal_w = (1.0 - pt) ** gamma
        y = labels.astype(jnp.float32)
        alpha_t = alpha * y + (1.0 - alpha) * (1.0 - y)
        return _reduce(alpha_t * focal_w * ce, weights)

    return loss


def _smooth_targets(labels: jnp.ndarray, num_classes: int, smoothing: float) -> jnp.ndarray:
    # off-class ε/(K−1), true class 1−ε (reference losses.py:96-101)
    off = smoothing / (num_classes - 1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    return onehot * (1.0 - smoothing - off) + off


@register_loss("label_smoothing")
def label_smoothing_ce(smoothing: float = 0.1, **_kw) -> LossFn:
    def loss(logits, labels, weights=None):
        logp = _log_softmax(logits)
        tgt = _smooth_targets(labels, logits.shape[-1], smoothing)
        return _reduce(-jnp.sum(tgt * logp, axis=-1), weights)

    return loss


@register_loss("focal_smoothing")
def focal_label_smoothing(
    alpha: float = 0.35, gamma: float = 2.0, smoothing: float = 0.1, **_kw
) -> LossFn:
    """Focal × label smoothing (reference losses.py:111-171): smoothed-target
    CE scaled by alpha_t·(1−pt)^γ where pt is the *true-class* probability."""

    def loss(logits, labels, weights=None):
        logp = _log_softmax(logits)
        tgt = _smooth_targets(labels, logits.shape[-1], smoothing)
        ce = -jnp.sum(tgt * logp, axis=-1)
        pt = jnp.take_along_axis(jnp.exp(logp), labels[:, None], axis=-1)[:, 0]
        focal_w = (1.0 - pt) ** gamma
        y = labels.astype(jnp.float32)
        alpha_t = alpha * y + (1.0 - alpha) * (1.0 - y)
        return _reduce(alpha_t * focal_w * ce, weights)

    return loss


@register_loss("weighted")
def weighted_ce(
    class_counts: Optional[Sequence[float]] = None,
    class_weights: Optional[Sequence[float]] = None,
    **_kw,
) -> LossFn:
    """Class-weighted CE. Weights from counts: total/(K·count_k)
    (reference losses.py:174-208); torch F.cross_entropy(weight=...) semantics
    (weighted mean: normalise by the sum of applied weights)."""
    if class_weights is None and class_counts is not None:
        counts = jnp.asarray(class_counts, jnp.float32)
        class_weights = counts.sum() / (counts.shape[0] * counts)
    w = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)

    def loss(logits, labels, weights=None):
        per = _nll(logits, labels)
        if w is None:
            return _reduce(per, weights)
        cw = w[labels]
        if weights is not None:
            cw = cw * weights.astype(jnp.float32)
        return jnp.sum(per * cw) / jnp.maximum(jnp.sum(cw), 1e-9)

    return loss


def get_loss_function(
    loss_type: str = "ce",
    alpha: float = 0.35,
    gamma: float = 2.0,
    smoothing: float = 0.1,
    class_counts: Optional[Sequence[float]] = None,
    class_weights: Optional[Sequence[float]] = None,
) -> LossFn:
    """Factory matching the reference's get_loss_function (losses.py:211-242)."""
    if loss_type not in LOSS_REGISTRY:
        known = ", ".join(sorted(LOSS_REGISTRY))
        raise ValueError(f"Unknown loss type: {loss_type}. Available: {known}")
    return LOSS_REGISTRY[loss_type](
        alpha=alpha,
        gamma=gamma,
        smoothing=smoothing,
        class_counts=class_counts,
        class_weights=class_weights,
    )
