"""Per-program XLA compiler options from the environment.

On a standard TPU host, XLA tuning knobs travel via the ``XLA_FLAGS`` env
var. Through the axon remote-compile relay that path is DEAD: XLA_FLAGS is
parsed by the *local* process (parse_flags_from_env), whose CPU-only flag
registry aborts on any ``--xla_tpu_*`` name (measured — see
docs/PERFORMANCE.md "XLA flag sweeping"). PJRT ``compiler_options``, by
contrast, are serialized into the compile *request* and validated/honored by
the remote compiler (a bogus option name errors remotely), so they work both
on real hosts and through the relay.

``MMC_COMPILER_OPTIONS`` accepts JSON (``{"xla_tpu_scoped_vmem_limit_kib":
"65536"}``) or comma-separated ``key=value`` pairs. Benchmarks and the flag
sweep harness (scripts/sweep_xla_flags.py) pass the result to
``jax.jit(..., compiler_options=...)``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

ENV_VAR = "MMC_COMPILER_OPTIONS"


def parse_compiler_options(spec: str) -> Dict[str, str]:
    """Parse a JSON object or ``k=v,k=v`` string into an options dict."""
    spec = spec.strip()
    if not spec:
        return {}
    if spec.startswith("{"):
        obj = json.loads(spec)
        if not isinstance(obj, dict):
            raise ValueError(f"{ENV_VAR} JSON must be an object, got {type(obj)}")
        # XLA option values are lowercase ("true"/"false"), not Python reprs
        def _s(v):
            return ("true" if v else "false") if isinstance(v, bool) else str(v)

        return {str(k): _s(v) for k, v in obj.items()}
    out: Dict[str, str] = {}
    for pair in spec.split(","):
        pair = pair.strip()
        if not pair:
            continue
        if "=" not in pair:
            raise ValueError(f"{ENV_VAR}: expected key=value, got {pair!r}")
        k, v = pair.split("=", 1)
        out[k.strip()] = v.strip()
    return out


def compiler_options_from_env() -> Optional[Dict[str, str]]:
    """Options dict from ``MMC_COMPILER_OPTIONS``, or None when unset/empty
    (None keeps jax.jit's default-compiled program byte-identical)."""
    spec = os.environ.get(ENV_VAR)
    if not spec:
        return None
    opts = parse_compiler_options(spec)
    return opts or None
