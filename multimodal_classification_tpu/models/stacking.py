"""Convert encoder params between the canonical per-layer tree and the
scan-over-layers stacked layout (``config.stacked_encoder``).

Canonical layout (what every converter produces and what checkpoints of
unstacked models hold; reference key families: vilbert_facebook_arch.py
layer/v_layer/c_layer modules):

    bert/encoder/layer_{0..2K-1}/...   (text)
    bert/encoder/v_layer_{0..K-1}/...  (visual)
    bert/encoder/c_layer_{0..K-1}/...  (cross-modal)

Stacked layout (one nn.scan over K superlayers, leaves carry a leading
[K] axis):

    bert/encoder/stack/t_a/...  <- layer_{2k}
    bert/encoder/stack/t_b/...  <- layer_{2k+1}
    bert/encoder/stack/v/...    <- v_layer_k
    bert/encoder/stack/c/...    <- c_layer_k

Both directions are exact (pure stack/unstack along axis 0), so a model
trained stacked exports through the same torch/Orbax converters after
``unstack_encoder_params`` and vice versa.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def _stack_group(layers) -> Any:
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def stack_encoder_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Canonical → stacked. Non-encoder subtrees pass through untouched."""
    enc = params["bert"]["encoder"]
    if "stack" in enc:
        return params
    n_text = len([k for k in enc if k.startswith("layer_")])
    k_sup = len([k for k in enc if k.startswith("v_layer_")])
    if n_text != 2 * k_sup:
        raise ValueError(
            f"encoder layout not stackable: {n_text} text vs {k_sup} visual layers"
        )
    stack = {
        "t_a": _stack_group([enc[f"layer_{2 * k}"] for k in range(k_sup)]),
        "t_b": _stack_group([enc[f"layer_{2 * k + 1}"] for k in range(k_sup)]),
        "v": _stack_group([enc[f"v_layer_{k}"] for k in range(k_sup)]),
        "c": _stack_group([enc[f"c_layer_{k}"] for k in range(k_sup)]),
    }
    new_enc = {k: v for k, v in enc.items()
               if not k.split("_")[-1].isdigit()}
    new_enc["stack"] = stack
    out = dict(params)
    out["bert"] = dict(params["bert"])
    out["bert"]["encoder"] = new_enc
    return out


def unstack_encoder_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Stacked → canonical. Inverse of :func:`stack_encoder_params`."""
    enc = params["bert"]["encoder"]
    if "stack" not in enc:
        return params
    stack = enc["stack"]
    k_sup = jax.tree.leaves(stack["v"])[0].shape[0]

    def slice_group(tree, k):
        return jax.tree.map(lambda x: x[k], tree)

    new_enc = {k: v for k, v in enc.items() if k != "stack"}
    for k in range(k_sup):
        new_enc[f"layer_{2 * k}"] = slice_group(stack["t_a"], k)
        new_enc[f"layer_{2 * k + 1}"] = slice_group(stack["t_b"], k)
        new_enc[f"v_layer_{k}"] = slice_group(stack["v"], k)
        new_enc[f"c_layer_{k}"] = slice_group(stack["c"], k)
    out = dict(params)
    out["bert"] = dict(params["bert"])
    out["bert"]["encoder"] = new_enc
    return out
