"""Int8 serving quantization — MXU-native inference path.

The v5e MXU executes int8×int8→int32 matmuls at twice the bf16 rate
(394 vs 197 TOPS). For the eval/serving path we quantize every large Dense
kernel offline (symmetric, per-output-channel scales) and quantize
activations dynamically per row at call time; the ``lax.dot_general`` with
``preferred_element_type=jnp.int32`` then lowers onto the int8 MXU path.
Both operands must be int8 for that to happen — weight-only quantization
would just dequantize into bf16 matmuls and win nothing.

The reference has no serving-optimisation story at all (fp32 eager torch
inference, reference: pipelines/model_training/nodes.py:907-1009); this is a
framework feature gated by parity tests (logit agreement on the fp32 path)
rather than a parity port. It is opt-in and leaves the parameter tree
untouched: the quantized kernels live in a separate "quant" variable
collection mirroring the param tree, built once from trained params.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Kernels with min(shape) below this stay float: they are cheap anyway and
# include precision-sensitive projections (spatial 5→1024, classifier →2).
DEFAULT_MIN_DIM = 256


def quantize_kernel(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-output-channel int8 quantization of a [in, out] kernel."""
    w = np.asarray(w, np.float32)
    scale = np.abs(w).max(axis=0) / 127.0  # [out]
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def int8_dot(
    x: jnp.ndarray,
    qkernel: jnp.ndarray,
    wscale: jnp.ndarray,
    ascale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``x @ dequant(qkernel)`` computed as an int8 MXU matmul.

    With ``ascale=None`` activations are quantized per row (dynamic symmetric
    max-abs): the scale factors stay outside the dot, so the int32 accumulator
    is exact and the only error is the two rounding steps. With a static
    (calibrated, per-tensor) ``ascale`` the max-reduction disappears: the
    quantize step is a pure elementwise prologue XLA fuses into the dot's
    operand stream, with no reduce-before-matmul dependency. Out-of-range
    activations saturate at ±127 (calibration should cover the live range —
    see :func:`calibrate_quant_tree`).
    """
    xf = x.astype(jnp.float32)
    if ascale is None:
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        ascale = jnp.maximum(amax, 1e-12) / 127.0
    qx = jnp.clip(jnp.rint(xf / ascale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        qx, qkernel,
        (((qx.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * ascale * wscale


# backward-compatible name (pre-calibration API)
def int8_dynamic_dot(x, qkernel, wscale):
    return int8_dot(x, qkernel, wscale, ascale=None)


def build_quant_tree(params: Dict[str, Any], min_dim: int = DEFAULT_MIN_DIM) -> Dict[str, Any]:
    """Walk a Flax param tree; for every Dense ``{"kernel": [in,out], ...}``
    with both dims ≥ ``min_dim``, emit ``{"qkernel": int8, "wscale": f32[out]}``
    at the same path. The result is passed to ``model.apply`` as the
    ``"quant"`` collection (see ``models.layers.QuantizableDense``)."""
    out: Dict[str, Any] = {}
    for k, v in params.items():
        if not isinstance(v, dict):
            continue
        kernel = v.get("kernel")
        if (
            kernel is not None
            and getattr(kernel, "ndim", 0) == 2
            and min(kernel.shape) >= min_dim
        ):
            q, s = quantize_kernel(np.asarray(jax.device_get(kernel)))
            out[k] = {"qkernel": jnp.asarray(q), "wscale": jnp.asarray(s)}
        else:
            sub = build_quant_tree(v, min_dim)
            if sub:
                out[k] = sub
    return out


def calibrate_quant_tree(model, params, quant: Dict[str, Any], batches) -> Dict[str, Any]:
    """Add STATIC per-tensor activation scales to a quant tree.

    Runs the given calibration batches through the FLOAT path; every
    ``QuantizableDense`` sows the max-abs of its input into the ``"calib"``
    collection (models/layers.py). The returned tree is ``quant`` with a
    scalar ``"ascale"`` (= observed max / 127) alongside each quantized
    kernel — the int8 eval step then skips the per-row max-reduction the
    dynamic path inserts before every matmul. Layers the calibration data
    never reaches stay dynamic.

    Accuracy: static per-tensor scales are coarser than per-row dynamic ones;
    gate with a prediction-agreement test on held-out data before enabling
    (the reference has no quantization story at all — this whole path is a
    framework extension; see ops/quant.py module docstring).
    """
    from multimodal_classification_tpu.training.train import model_inputs

    @jax.jit
    def calib_step(p, b):
        _, mut = model.apply(
            {"params": p}, **model_inputs(b), deterministic=True, mutable=["calib"]
        )
        return mut["calib"]

    amax_tree = None
    for b in batches:
        c = calib_step(params, b)
        amax_tree = c if amax_tree is None else jax.tree.map(jnp.maximum, amax_tree, c)
    if amax_tree is None:
        raise ValueError("calibrate_quant_tree needs at least one batch")
    amax_tree = jax.device_get(amax_tree)
    return _with_ascales(quant, amax_tree)


def _with_ascales(quant: Dict[str, Any], calib) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in quant.items():
        sub_calib = calib.get(k, {}) if isinstance(calib, dict) else {}
        if not isinstance(v, dict):
            out[k] = v
        elif "qkernel" in v:
            amax = sub_calib.get("amax") if isinstance(sub_calib, dict) else None
            if amax is None:
                out[k] = dict(v)  # never calibrated: stays per-row dynamic
            else:
                a = float(np.asarray(amax))
                out[k] = {**v, "ascale": jnp.float32(max(a, 1e-12) / 127.0)}
        else:
            out[k] = _with_ascales(v, sub_calib)
    return out


def count_quantized(quant: Dict[str, Any]) -> int:
    """Number of quantized kernels in a quant tree (for logging/tests)."""
    n = 0
    for v in quant.values():
        if isinstance(v, dict):
            n += 1 if "qkernel" in v else count_quantized(v)
    return n
