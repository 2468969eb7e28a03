"""Environment diagnosis (``mmc-tpu doctor``): is this host ready to train?

Every check is hang-proof: anything that can block on a remote backend (TPU
relay init — which HANGS rather than erroring when the relay is down) runs
in a time-boxed subprocess. The reference has no equivalent surface; this
exists because remote-TPU environments fail in ways local-GPU ones don't
(unreachable relay, missing native toolchain, cold compilation cache).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from typing import List, Optional, Tuple

Check = Tuple[str, str, str]  # (name, status: ok|warn|fail, detail)

# Two-phase probe: device enumeration, THEN a trivial compute with a value
# fetch. The phases fail independently in the field (measured on this relay):
# a downed relay hangs ``jax.devices()``, while a *stalled* relay answers the
# device list in milliseconds and then hangs the first executable load for
# minutes — a devices-only probe reports "ok" for a backend that cannot run a
# single op. Each phase prints its own JSON line so the parent can tell which
# one never arrived.
_PROBE = (
    "import jax, json, time\n"
    "d = jax.devices()\n"
    "print(json.dumps({'platform': d[0].platform, 'kind': d[0].device_kind,"
    " 'n': len(d)}), flush=True)\n"
    "import jax.numpy as jnp\n"
    "t0 = time.perf_counter()\n"
    "x = jnp.ones((8, 128))\n"
    "v = float((x @ x.T).sum())\n"  # value fetch: block_until_ready can lie
    "print(json.dumps({'op_ms': round((time.perf_counter() - t0) * 1e3, 1),"
    " 'value': v}), flush=True)\n"
)


def _repo_compile_cache() -> Optional[str]:
    """The committed warm-start XLA cache (bench.py's), if present."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(root, "data", "09_bench_cache", "jax_cache")
    return cand if os.path.isdir(cand) else None


def _probe_backend(timeout: float, force_cpu: bool) -> Tuple[str, str]:
    env = dict(os.environ)
    # warm-start the probe's trivial-op compile from the committed cache so a
    # healthy-but-slow relay (1-185 s compiles measured for the SAME op) does
    # not fail the probe on repeat doctor runs
    if "JAX_COMPILATION_CACHE_DIR" not in env:
        cache = _repo_compile_cache()
        if cache:
            env["JAX_COMPILATION_CACHE_DIR"] = cache
    code = _PROBE
    if force_cpu:
        env["JAX_PLATFORMS"] = "cpu"
        code = "import jax\njax.config.update('jax_platforms', 'cpu')\n" + _PROBE
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=timeout,
        )
        out, rc, timed_out = proc.stdout, proc.returncode, False
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"")
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        rc, timed_out = None, True
    lines = []
    for ln in out.strip().splitlines():
        try:
            lines.append(json.loads(ln))
        except Exception:
            continue
    if timed_out:
        if len(lines) >= 2:
            # BOTH phases printed: compute succeeded, the process then hung
            # (teardown / backend shutdown) — a different failure mode from a
            # compute stall, and the backend itself is usable.
            info, op = lines[0], lines[1]
            return "warn", (
                f"{info.get('platform')}:{info.get('kind')} compute completed "
                f"(trivial op {op.get('op_ms', '?')} ms) but the probe process "
                f"hung on exit past {timeout:.0f}s — backend usable, teardown "
                "wedged"
            )
        if lines:  # devices answered, compute never did — today's stall mode
            info = lines[0]
            return "fail", (
                f"{info.get('platform')}:{info.get('kind')} visible but a "
                f"trivial op did not complete within {timeout:.0f}s — relay "
                "accepts connections but compute/executable-load is stalled, "
                "OR the relay is healthy-but-slow (measured 1-185 s for the "
                "same trivial op): retry with --timeout 300"
            )
        return "fail", f"no response within {timeout:.0f}s (relay down or hung init)"
    if rc != 0:
        return "fail", (proc.stderr.strip().splitlines() or ["unknown error"])[-1][:200]
    if len(lines) < 2:
        return "warn", f"unparseable probe output: {out[:200]!r}"
    info, op = lines[0], lines[1]
    return "ok", (f"{info['platform']}:{info['kind']} x{info['n']} "
                  f"(trivial op {op['op_ms']:.0f} ms)")


def run_doctor(timeout: float = 60.0) -> List[Check]:
    checks: List[Check] = []

    import jax

    checks.append(("versions", "ok",
                   f"python {sys.version.split()[0]}, jax {jax.__version__}"))

    status, detail = _probe_backend(timeout, force_cpu=False)
    checks.append(("default backend (accelerator)", status, detail))

    status, detail = _probe_backend(min(timeout, 120.0), force_cpu=True)
    # CPU must always work — it is the test/fallback path
    checks.append(("cpu backend (fallback)",
                   status if status == "ok" else "fail", detail))

    # native C++ components (both have pure-python fallbacks)
    try:
        from multimodal_classification_tpu.data.lmdb_store import build_native_reader

        so = build_native_reader()
        checks.append(("native LMDB reader", "ok" if so else "warn",
                       so or "build unavailable; python reader fallback"))
    except Exception as e:  # pragma: no cover - defensive
        checks.append(("native LMDB reader", "warn", f"{e} (python fallback)"))
    try:
        from multimodal_classification_tpu.data.tokenizer_native import (
            build_native_tokenizer,
        )

        so = build_native_tokenizer()
        checks.append(("native WordPiece tokenizer", "ok" if so else "warn",
                       so or "build unavailable; python tokenizer fallback"))
    except Exception as e:
        checks.append(("native WordPiece tokenizer", "warn",
                       f"{e} (python fallback)"))

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache and os.path.isdir(cache):
        n = len(os.listdir(cache))
        checks.append(("XLA compilation cache", "ok", f"{cache} ({n} entries)"))
    else:
        checks.append(("XLA compilation cache", "warn",
                       "JAX_COMPILATION_CACHE_DIR unset — every process "
                       "repays the full compile (minutes on a remote TPU)"))

    for mod in ("flax", "optax", "orbax.checkpoint"):
        try:
            __import__(mod)
            checks.append((mod, "ok", ""))
        except Exception as e:
            checks.append((mod, "fail", str(e)[:200]))
    return checks


def format_checks(checks: List[Check]) -> str:
    icon = {"ok": "ok  ", "warn": "WARN", "fail": "FAIL"}
    width = max(len(n) for n, _, _ in checks)
    return "\n".join(f"[{icon[s]}] {n:<{width}}  {d}" for n, s, d in checks)


def main(timeout: float = 60.0) -> int:
    checks = run_doctor(timeout)
    print(format_checks(checks))
    return 1 if any(s == "fail" for _, s, _ in checks) else 0
