#!/usr/bin/env python
"""Per-op profile of the serving/eval forward (bench_serving configuration).

Same XPlane parsing as profile_step.py, but around a window of eval_step
dispatches at a chosen batch size (default 64, the throughput point). Use to
answer why eval MFU sits where it does (at batch 64 the bf16 forward measured
~41 ms ≈ 25% MFU — 30 ms is not matmul).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache \
         python scripts/profile_eval.py [batch] [bf16|int8] [seq]
Output: tables on stderr + ONE JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_step import parse_xplane  # noqa: E402  (same scripts/ dir)


def main() -> int:
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    path = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    seq = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    trace_dir = f"/tmp/jax-trace-eval-{path}-{bs}-{seq}"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_classification_tpu.config import facebook_vilbert_config
    from multimodal_classification_tpu.models.vilbert import (
        ViLBERTForClassification,
        dummy_batch,
    )
    from multimodal_classification_tpu.ops.quant import build_quant_tree
    from multimodal_classification_tpu.training.train import (
        make_eval_step,
        make_quant_eval_step,
        model_inputs,
    )

    cfg = facebook_vilbert_config()
    model = ViLBERTForClassification(cfg)
    batch = dummy_batch(cfg, bs, seq, 100)
    rng = np.random.default_rng(0)
    batch["visual_features"] = jnp.asarray(
        rng.standard_normal(batch["visual_features"].shape), jnp.bfloat16
    )
    params = model.init(jax.random.key(0), **batch)["params"]
    if path == "int8":
        quant = build_quant_tree(params)
        _step = jax.jit(make_quant_eval_step(model))

        def step(b):
            return _step(params, quant, b)
    else:
        _step = jax.jit(make_eval_step(model))

        def step(b):
            return _step(params, b)

    inputs = model_inputs(batch)
    for _ in range(3):
        logits = step(inputs)
    _ = float(logits[0, 0])

    k = 8
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(k):
        logits = step(inputs)
    _ = float(logits[0, 0])
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    wall_ms = dt / k * 1000.0

    by_opcode, by_name, planes = parse_xplane(trace_dir)
    total = sum(by_opcode.values())
    print(f"eval {path} batch {bs}: wall {wall_ms:.2f} ms/step over {k} dispatches; "
          f"planes {planes}", file=sys.stderr)
    print(f"device op time: {total:.1f} ms total -> {total / k:.2f} ms/step",
          file=sys.stderr)
    print("\n-- by HLO opcode --", file=sys.stderr)
    for op, ms in by_opcode.most_common(15):
        print(f"{ms / k:9.3f} ms/step  {100 * ms / max(total, 1e-9):5.1f}%  {op}",
              file=sys.stderr)
    print("\n-- top individual ops --", file=sys.stderr)
    for name, ms in by_name.most_common(15):
        print(f"{ms / k:9.3f} ms/step  {name[:110]}", file=sys.stderr)

    print(json.dumps({
        "path": path, "batch_size": bs, "seq": seq,
        "wall_ms_per_step": round(wall_ms, 2),
        "device_ms_per_step": round(total / k, 2),
        "by_opcode_ms_per_step": {o: round(v / k, 3)
                                  for o, v in by_opcode.most_common(10)},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
