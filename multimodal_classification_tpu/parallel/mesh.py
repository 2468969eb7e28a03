"""Mesh construction + sharding rules.

Layout: a 2-D logical mesh (dp, mp). Batches shard their leading axis over
``dp`` (pure data parallelism — gradient psum rides ICI); parameters shard
over ``mp`` with Megatron-style tensor parallelism: column-parallel QKV /
FFN-up projections, row-parallel attention-output / FFN-down projections.
XLA inserts the all-reduces at the row-parallel boundaries.

ViLBERT head counts (12 text / 8 visual+bi) admit mp ∈ {1, 2, 4}. At the
reference's model scale (~250M params) dp-only is fastest; mp exists for
serving-latency and as the scaling path, and is exercised by
``__graft_entry__.dryrun_multichip`` and the CPU-mesh tests.
"""

from __future__ import annotations

import re
from typing import Any, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec) — first match wins; paths are "/"-joined param tree keys.
DEFAULT_TP_RULES: List[Tuple[str, P]] = [
    # column-parallel: QKV and bi-attention projections (out dim = heads·head_dim)
    (r".*/(query|key|value|query1|key1|value1|query2|key2|value2)/kernel$", P(None, "mp")),
    (r".*/(query|key|value|query1|key1|value1|query2|key2|value2)/bias$", P("mp")),
    # column-parallel: FFN up-projection
    (r".*/(intermediate|v_intermediate|t_intermediate)/dense/kernel$", P(None, "mp")),
    (r".*/(intermediate|v_intermediate|t_intermediate)/dense/bias$", P("mp")),
    # row-parallel: attention output + FFN down-projection (input dim sharded)
    (r".*/(attention_output|output|v_output|t_output|v_output_attn|t_output_attn)/dense/kernel$", P("mp", None)),
    # large embedding tables: shard the vocab axis (no collective on lookup
    # thanks to XLA's gather partitioning)
    (r".*/word_embeddings/embedding$", P("mp", None)),
]


def build_mesh(
    shape: Sequence[int] = (-1, 1),
    axis_names: Sequence[str] = ("dp", "mp"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a Mesh over the available devices; one -1 entry is inferred."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = max(len(devices) // known, 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Leading-axis sharding for host→device batches."""
    return NamedSharding(mesh, P(axis))


def _spec_fits(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> bool:
    for dim, names in enumerate(spec):
        if names is None:
            continue
        names = (names,) if isinstance(names, str) else names
        size = int(np.prod([mesh.shape[n] for n in names]))
        if dim >= len(shape) or shape[dim] % size != 0:
            return False
    return True


def param_shardings(
    params: Any,
    mesh: Mesh,
    rules: Optional[List[Tuple[str, P]]] = None,
) -> Any:
    """Pytree of NamedShardings for a param tree. Leaves whose shape is not
    divisible by the rule's axis size fall back to replicated (e.g. when
    mp=1, or odd embedding dims)."""
    rules = DEFAULT_TP_RULES if rules is None else rules
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path) -> str:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
        return "/".join(parts)

    shardings = {}
    for path, leaf in flat:
        s = path_str(path)
        spec = P()
        for pat, cand in compiled:
            if pat.match(s):
                # stacked-encoder leaves (models/stacking.py) carry a leading
                # [num_superlayers] axis over the rule's target tensor —
                # shift the spec right so the same TP rule applies per slice
                if "/stack/" in s and leaf.ndim == len(cand) + 1:
                    cand = P(None, *cand)
                if _spec_fits(cand, tuple(leaf.shape), mesh):
                    spec = cand
                break
        shardings[s] = NamedSharding(mesh, spec)

    def rebuild(path, leaf):
        return shardings[path_str(path)]

    return jax.tree_util.tree_map_with_path(rebuild, params)


def shard_params(params: Any, mesh: Mesh, rules=None) -> Any:
    """device_put a param tree according to the TP rules."""
    sh = param_shardings(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, sh)
