#!/usr/bin/env python
"""Convert a PyTorch ViLBERT checkpoint to a native Orbax checkpoint.

Replaces the reference's load-time fuzzy key remapping (vilbert_hf.py:166-201,
vilbert_facebook_arch.py:644-683) with a one-time explicit conversion.

Usage:
  python scripts/convert_checkpoint.py weights/vilbert_pretrained_cc.bin \
      --output data/05_model_output/converted --arch facebook
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--output", required=True)
    ap.add_argument("--arch", choices=["facebook", "core"], default="facebook")
    args = ap.parse_args()

    import jax

    from multimodal_classification_tpu.config import (
        core_vilbert_config,
        facebook_vilbert_config,
    )
    from multimodal_classification_tpu.models.convert import (
        convert_facebook_vilbert,
        load_torch_checkpoint,
        merge_params,
    )
    from multimodal_classification_tpu.models.vilbert import (
        ViLBERTForClassification,
        dummy_batch,
    )
    from multimodal_classification_tpu.utils.checkpoint import CheckpointManager

    cfg = facebook_vilbert_config() if args.arch == "facebook" else core_vilbert_config()
    model = ViLBERTForClassification(cfg)
    batch = dummy_batch(cfg, 1, 8, 8)
    init = model.init(jax.random.key(0), **batch)["params"]

    sd = load_torch_checkpoint(args.checkpoint)
    loaded = convert_facebook_vilbert(sd, cfg)
    params, n, total = merge_params(init, loaded)
    print(f"loaded {n}/{total} tensors from {args.checkpoint}")

    ckpt = CheckpointManager(args.output)
    ckpt.save("best", {"params": params, "epoch": 0, "val_auroc": 0.0})
    print(f"wrote Orbax checkpoint → {args.output}/best")
    return 0


if __name__ == "__main__":
    sys.exit(main())
