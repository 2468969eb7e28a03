#!/usr/bin/env python
"""Per-op profile of the flagship train step (bench.py configuration).

Captures a jax.profiler trace around one K-step compiled dispatch on the live
backend, parses the XPlane protobuf directly (no TensorBoard needed), and
prints device time rolled up by HLO opcode plus the top individual ops.
This answers "where do the remaining milliseconds go" between rounds
(results recorded in CLAUDE.md perf notes).

Parsing notes (validated against a real v5e capture):
- the device plane is ``/device:TPU:0``; the per-op timeline is the
  ``XLA Ops`` line; ``Async XLA Ops`` overlaps and would double-count.
- the outer ``%while`` (the lax.scan over K steps) encloses everything —
  excluded from aggregation; the remaining events tile the step wall time.

Usage:  JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache python scripts/profile_step.py
Output: tables on stderr + ONE JSON line on stdout with the breakdown.
"""

from __future__ import annotations

import collections
import glob
import json
import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CONTROL_OPS = {"while", "conditional", "call"}


def capture(trace_dir: str):
    """Warm up, then trace one K-step dispatch. Returns (wall ms/step, K)."""
    import time

    import jax

    import bench

    step, state, data, it, rng_key, k = bench.setup()
    for _ in range(2):
        state, m = step(state, data, next(it), rng_key)
    _ = float(m["loss"])  # device→host fetch: genuine completion barrier

    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    state, m = step(state, data, next(it), rng_key)
    _ = float(m["loss"])
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    return dt / k * 1000.0, k


def _import_xplane_pb2():
    import importlib

    for mod in ("tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "tensorflow.core.profiler.protobuf.xplane_pb2",
                "tsl.profiler.protobuf.xplane_pb2"):
        try:
            return importlib.import_module(mod)
        except ImportError:
            continue
    raise ImportError("no xplane_pb2 available (tensorflow profiler protos)")


def parse_xplane(trace_dir: str):
    """Aggregate `XLA Ops` event durations from the newest .xplane.pb.

    Returns (by_opcode, by_name): each {key: total_ms} over the traced
    dispatch, outer control-flow ops excluded.
    """
    xplane_pb2 = _import_xplane_pb2()
    paths = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    device_planes = [p for p in space.planes if re.match(r"/device:(TPU|CPU)", p.name)]
    tpu = [p for p in device_planes if "TPU" in p.name]
    planes = tpu or device_planes
    by_opcode: collections.Counter = collections.Counter()
    by_name: collections.Counter = collections.Counter()
    for plane in planes:
        md = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = md.get(ev.metadata_id, "?")
                m = re.match(r"%([a-zA-Z\-_]+)", name)
                opcode = m.group(1) if m else "?"
                if opcode in _CONTROL_OPS:
                    continue
                ms = ev.duration_ps / 1e9
                by_opcode[opcode] += ms
                by_name[name.split(" = ")[0]] += ms
    return by_opcode, by_name, [p.name for p in planes]


def main() -> int:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax-trace-step"
    wall_ms, k = capture(trace_dir)
    by_opcode, by_name, planes = parse_xplane(trace_dir)
    total = sum(by_opcode.values())

    print(f"wall: {wall_ms:.1f} ms/step over a {k}-step dispatch; "
          f"planes: {planes}", file=sys.stderr)
    print(f"device op time: {total:.1f} ms total -> {total / k:.2f} ms/step",
          file=sys.stderr)
    print("\n-- by HLO opcode --", file=sys.stderr)
    for op, ms in by_opcode.most_common(20):
        print(f"{ms / k:9.3f} ms/step  {100 * ms / max(total, 1e-9):5.1f}%  {op}",
              file=sys.stderr)
    print("\n-- top 20 individual ops (summed over executions) --", file=sys.stderr)
    for name, ms in by_name.most_common(20):
        print(f"{ms / k:9.3f} ms/step  {name[:100]}", file=sys.stderr)

    print(json.dumps({
        "wall_ms_per_step": round(wall_ms, 2),
        "device_ms_per_step": round(total / k, 2),
        "by_opcode_ms_per_step": {o: round(v / k, 3)
                                  for o, v in by_opcode.most_common(12)},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
