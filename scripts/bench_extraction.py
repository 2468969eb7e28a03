#!/usr/bin/env python
"""Feature-extraction throughput bench (batched, jitted extractors on TPU).

The reference's only published timing datum is "DINOv2 adds ~0.5 s/image"
on its GPU (reference README.md:392) — because it runs the ViT per image
inside ``Dataset.__getitem__`` (nodes.py:129-148). Here extractors are
batched jitted functions (extractors/base.py), so the same ViT-L/14 @518px
sweep runs as full-batch MXU work. This script measures steady-state
images/sec per extractor on the live backend.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache \
         python scripts/bench_extraction.py [extractor ...]
Prints one JSON line per extractor.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (registry name, extractor kwargs, bench batch size)
DEFAULT_SPECS = [
    ("dinov2", {"model_size": "large", "selection": "interpolate"}, 8),
    ("resnet152_roi", {}, 8),
    ("resnet", {}, 16),
]


def bench_blip_caption(bs: int = 8):
    """Native BLIP greedy captioning (data/augment.py CES enrichment path,
    models/blip.py): the reference runs BLIP per image through transformers
    on its GPU with no published timing."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_classification_tpu.models.blip import BlipForCaptioning

    import os

    m = BlipForCaptioning()
    params = m.init_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(
        -1, 1, (bs, m.cfg.image_size, m.cfg.image_size, 3)).astype(np.float32))
    gen = (m.generate_greedy if os.environ.get("BLIP_NO_KV_CACHE")
           else m.generate_greedy_cached)
    max_len = int(os.environ.get("BLIP_MAX_LEN", 24))
    t0 = time.perf_counter()
    ids = gen(params, imgs, max_length=max_len)
    _ = int(ids[0, 1])
    compile_s = time.perf_counter() - t0
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        ids = gen(params, imgs, max_length=max_len)
    _ = int(ids[0, 1])
    dt = time.perf_counter() - t0
    return {
        "extractor": "blip_caption",
        "batch_size": bs,
        "image_size": m.cfg.image_size,
        "max_length": max_len,
        "kv_cache": not bool(os.environ.get("BLIP_NO_KV_CACHE")),
        "ms_per_image": round(dt / (n * bs) * 1000, 2),
        "images_per_sec": round(n * bs / dt, 1),
        "first_call_s": round(compile_s, 1),
    }


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import multimodal_classification_tpu.extractors  # noqa: F401 (registry)
    from multimodal_classification_tpu.registry import get_feature_extractor

    names = sys.argv[1:]
    specs = [s for s in DEFAULT_SPECS if not names or s[0] in names]
    dev = jax.devices()[0]
    print(f"extraction bench on {dev.platform}:{dev.device_kind}", file=sys.stderr)

    if not names or "blip_caption" in names:
        print(json.dumps(bench_blip_caption()), flush=True)

    for name, kwargs, bs in specs:
        ex = get_feature_extractor(name, **kwargs)
        params = ex.init_params(jax.random.key(0))
        size = ex.image_size if isinstance(ex.image_size, tuple) else (
            ex.image_size, ex.image_size)
        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.uniform(0, 1, (bs, *size, 3)).astype(np.float32))
        t_compile = time.perf_counter()
        feats, spatial = ex.extract_batch(params, images)
        _ = float(jnp.asarray(feats)[0, 0, 0])
        compile_s = time.perf_counter() - t_compile
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            feats, spatial = ex.extract_batch(params, images)
        _ = float(jnp.asarray(feats)[0, 0, 0])
        dt = time.perf_counter() - t0
        per_image_ms = dt / (n * bs) * 1000
        print(json.dumps({
            "extractor": name,
            "batch_size": bs,
            "image_size": size[0],
            "ms_per_image": round(per_image_ms, 2),
            "images_per_sec": round(n * bs / dt, 1),
            "first_call_s": round(compile_s, 1),
            "feature_shape": list(np.asarray(feats).shape[1:]),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
