"""Flat-slab parameters/optimizer: run AdamW over contiguous buffers.

Why: the flagship train step's per-op profile (scripts/profile_step.py,
docs/PERFORMANCE.md) attributes ~4.2 ms/step to loop-carry copies of ~600
SMALL param tensors (biases / LayerNorm vectors and their Adam moments:
f32[768] ×415, f32[1024] ×339, bf16[768] ×390 per step) plus a long tail of
scattered small optimizer fusions. The round-2 ``pack_carry`` experiment
packed the scan carry but unpacked BEFORE the step body, so the optimizer
still updated ~600 individual leaves — measured neutral. This module keeps
the parameters in slab form THROUGH the whole step:

- ``Slabbed`` holds one flat vector per dtype for every leaf under
  ``threshold_bytes`` plus the untouched large leaves (matmul weights).
- The model consumes a view: ``make_unpack(spec)`` rebuilds the original
  pytree from static slab slices, with a ``custom_vjp`` whose backward is a
  CONCAT of the leaf cotangents — gradients therefore materialise directly
  as contiguous slabs (no pad/scatter chains), and the entire optimizer
  chain (clip → Adam moments → weight decay → LR → param add) is a handful
  of large fused elementwise passes instead of ~600 latency-bound ones.
- optax is tree-agnostic, so the unmodified ``adamw_mixed`` chain runs over
  ``Slabbed`` directly (each slab is one leaf; mu/nu dtype overrides apply
  per slab exactly as per leaf).

Numerics: Adam/decay/LR are elementwise → bit-identical per element.
``clip_by_global_norm`` sums squares in a different reduction order over the
concatenated vector, so the global step scale can differ at f32 rounding
(~1e-7 relative) — exactness tests use a tight allclose, not bit equality.

Checkpoint layout is preserved: ``slab_state_to_tree`` / ``tree_state_to_slab``
convert a whole TrainState (params AND optimizer moments — any subtree
mirroring the params structure) between the canonical per-leaf layout stored
on disk and the slab layout used in flight.

Reference counterpart: none — the reference's torch AdamW iterates Python
per-tensor (nodes.py:757); this is a TPU-native HBM-latency optimisation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from multimodal_classification_tpu.training.packing import (
    DEFAULT_THRESHOLD_BYTES,
    PackSpec,
    plan_packing,
)

__all__ = [
    "Slabbed", "plan_slabs", "slab_pack", "slab_unpack", "make_unpack",
    "slab_state_to_tree", "tree_state_to_slab",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Slabbed:
    """Slab representation of a params-like pytree: ``packs[dtype_name]`` is
    the flat vector holding every small leaf of that dtype (disjoint slices
    covering the whole vector), ``large`` the untouched big leaves in plan
    order."""

    packs: Dict[str, jnp.ndarray]
    large: Tuple[Any, ...]


def plan_slabs(tree, threshold_bytes: int = DEFAULT_THRESHOLD_BYTES) -> PackSpec:
    """Static slab plan (leaf order, per-dtype offsets) from an example tree.
    ``threshold_bytes=None``/negative → slab EVERYTHING (the whole-model
    variant where even matmul weights are views into one buffer per dtype)."""
    if threshold_bytes is None or threshold_bytes < 0:
        threshold_bytes = 1 << 62
    return plan_packing(tree, threshold_bytes=threshold_bytes)


def slab_pack(tree, spec: PackSpec) -> Slabbed:
    """Canonical pytree → Slabbed. Works for any tree with the planned
    structure regardless of leaf dtype (offsets are element counts): packing
    a bf16 moment tree planned from f32 params lands in a bf16 slab under
    the PLAN's dtype key (the key is a bucket name, not the storage dtype)."""
    leaves = spec.treedef.flatten_up_to(tree)
    parts: Dict[str, list] = {dt: [] for dt, _ in spec.pack_sizes}
    for i, dt, _off, _shape in spec.small:
        parts[dt].append(jnp.ravel(leaves[i]))
    packs = {
        dt: (jnp.concatenate(parts[dt]) if parts[dt] else jnp.zeros((0,), dt))
        for dt, _ in spec.pack_sizes
    }
    return Slabbed(packs, tuple(leaves[i] for i in spec.large_positions))


def slab_unpack(slabbed: Slabbed, spec: PackSpec):
    """Slabbed → canonical pytree (static slices; no custom_vjp — use
    :func:`make_unpack` inside differentiated code)."""
    leaves: list = [None] * spec.n_leaves
    for i, dt, off, shape in spec.small:
        size = 1
        for d in shape:
            size *= d
        leaves[i] = jax.lax.slice_in_dim(
            slabbed.packs[dt], off, off + size).reshape(shape)
    for pos, leaf in zip(spec.large_positions, slabbed.large):
        leaves[pos] = leaf
    return jax.tree.unflatten(spec.treedef, leaves)


def make_unpack(spec: PackSpec):
    """Differentiable unpack whose VJP is exactly :func:`slab_pack` of the
    cotangents: the slab slices partition each pack (disjoint + covering), so
    d(pack)/d(leaves) is the concat — XLA gets one contiguous gradient slab
    per dtype instead of a sum of ~600 zero-padded scatters."""

    @jax.custom_vjp
    def unpack_fn(slabbed: Slabbed):
        return slab_unpack(slabbed, spec)

    def fwd(slabbed):
        return slab_unpack(slabbed, spec), None

    def bwd(_res, ct_tree):
        return (slab_pack(ct_tree, spec),)

    unpack_fn.defvjp(fwd, bwd)
    return unpack_fn


def _is_slabbed(x) -> bool:
    return isinstance(x, Slabbed)


def slab_state_to_tree(slab_state, spec: PackSpec):
    """Replace every ``Slabbed`` node (params, Adam mu/nu, …) in a state
    pytree with its canonical per-leaf subtree — the on-disk checkpoint
    layout, identical to what a non-slab run saves."""
    leaves, treedef = jax.tree.flatten(slab_state, is_leaf=_is_slabbed)
    out = [slab_unpack(x, spec) if _is_slabbed(x) else x for x in leaves]
    return jax.tree.unflatten(treedef, out)


def tree_state_to_slab(slab_template, tree_state, spec: PackSpec):
    """Inverse of :func:`slab_state_to_tree`: pack every subtree of
    ``tree_state`` that sits where ``slab_template`` has a ``Slabbed`` node
    (template = a freshly initialised slab-layout state)."""
    t_leaves, treedef = jax.tree.flatten(slab_template, is_leaf=_is_slabbed)
    parts = treedef.flatten_up_to(tree_state)
    out = [slab_pack(p, spec) if _is_slabbed(t) else p
           for t, p in zip(t_leaves, parts)]
    return jax.tree.unflatten(treedef, out)
