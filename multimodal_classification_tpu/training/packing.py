"""Pack small pytree leaves into flat per-dtype vectors across a lax.scan.

Why: the K-step train dispatch (data/device_cache.py make_device_multi_step)
carries the full TrainState through a lax.scan. The per-op profile
(scripts/profile_step.py, CLAUDE.md) showed ~20% of device step time spent in
~800 latency-bound async copies of SMALL loop-carried tensors — biases,
LayerNorm params and their Adam moments (f32[768] ×415/step, f32[1024] ×339,
bf16[768] ×390, each a ~3 KB DMA costing ~4 µs of serialized latency).
Packing every small leaf into one flat vector per dtype turns those ~800
copies into a handful; the pack/unpack slices total a few MB of HBM traffic
(~negligible) and are numerically exact (pure reshape/concat).

MEASURED OUTCOME (v5e, flagship bench): 22.4 vs 21.9 ms/step — slightly
SLOWER than the plain scan. The per-iteration slice/concat fusions cost
about what the carry copies did; XLA's copies were already overlapped.
Kept as an exactness-tested opt-in (``pack_carry``) since the balance is
shape- and backend-dependent; default stays the plain scan.

Scope: leaves ≤ ``threshold_bytes`` (default 64 KB — catches every bias/LN
vector and scalar bookkeeping, leaves matmul weights alone, where packing
would add real bandwidth). Works on any pytree; used to wrap the scan carry.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

DEFAULT_THRESHOLD_BYTES = 65536


class PackSpec(NamedTuple):
    """Static recipe produced by :func:`plan_packing` (hashable, so jittable
    functions can close over it)."""

    treedef: Any
    n_leaves: int
    # per small leaf: (flat position, dtype name, offset into its pack, shape)
    small: Tuple[Tuple[int, str, int, Tuple[int, ...]], ...]
    large_positions: Tuple[int, ...]
    pack_sizes: Tuple[Tuple[str, int], ...]  # dtype name -> total elements


def plan_packing(tree, threshold_bytes: int = DEFAULT_THRESHOLD_BYTES) -> PackSpec:
    """Build the static packing plan from an example tree (shapes/dtypes)."""
    leaves, treedef = jax.tree.flatten(tree)
    small: List[Tuple[int, str, int, Tuple[int, ...]]] = []
    large: List[int] = []
    offsets = {}
    for i, leaf in enumerate(leaves):
        nbytes = leaf.size * leaf.dtype.itemsize
        if nbytes <= threshold_bytes:
            dt = jnp.dtype(leaf.dtype).name
            off = offsets.get(dt, 0)
            small.append((i, dt, off, tuple(leaf.shape)))
            offsets[dt] = off + leaf.size
        else:
            large.append(i)
    return PackSpec(
        treedef=treedef,
        n_leaves=len(leaves),
        small=tuple(small),
        large_positions=tuple(large),
        pack_sizes=tuple(sorted(offsets.items())),
    )


def pack(tree, spec: PackSpec):
    """tree -> (packs dict {dtype: flat vector}, [large leaves])."""
    leaves = spec.treedef.flatten_up_to(tree)
    parts = {dt: [] for dt, _ in spec.pack_sizes}
    for i, dt, _off, _shape in spec.small:
        parts[dt].append(leaves[i].reshape(-1))
    packs = {dt: jnp.concatenate(parts[dt]) if parts[dt] else jnp.zeros((0,), dt)
             for dt, _ in spec.pack_sizes}
    return packs, [leaves[i] for i in spec.large_positions]


def unpack(packs, large, spec: PackSpec):
    """Inverse of :func:`pack` — rebuild the original tree."""
    leaves: List[Any] = [None] * spec.n_leaves
    for i, dt, off, shape in spec.small:
        size = 1
        for d in shape:
            size *= d
        leaves[i] = jax.lax.slice_in_dim(packs[dt], off, off + size).reshape(shape)
    for pos, leaf in zip(spec.large_positions, large):
        leaves[pos] = leaf
    return jax.tree.unflatten(spec.treedef, leaves)


def scan_packed(body, init_carry, xs, spec: PackSpec, unroll: int = 1):
    """``lax.scan(body, init_carry, xs)`` with the carry's small leaves packed.

    ``body(carry_tree, x) -> (new_carry_tree, y)`` is the ordinary body;
    the packed representation is invisible to it.
    """

    def packed_body(packed_carry, x):
        packs, large = packed_carry
        carry = unpack(packs, large, spec)
        carry, y = body(carry, x)
        return pack(carry, spec), y

    packed, ys = jax.lax.scan(packed_body, pack(init_carry, spec), xs,
                              unroll=unroll)
    packs, large = packed
    return unpack(packs, large, spec), ys
