#!/usr/bin/env python
"""Convert ViLBERT checkpoints between the reference's torch layout and our
native Orbax format — both directions.

Forward (torch → Orbax) replaces the reference's load-time fuzzy key
remapping (vilbert_hf.py:166-201, vilbert_facebook_arch.py:644-683) with a
one-time explicit conversion. Reverse (--reverse, Orbax → torch .pt) writes
the reference's own ``save_model`` artifact ``{"model_state_dict", "metrics"}``
(nodes.py:953-964) so a model trained HERE can be validated or served by the
reference stack.

Usage:
  python scripts/convert_checkpoint.py weights/vilbert_pretrained_cc.bin \
      --output data/05_model_output/converted --arch facebook
  python scripts/convert_checkpoint.py data/05_model_output/checkpoints \
      --reverse --output vilbert_best.pt
"""

from __future__ import annotations

import argparse
import sys


def _forward(args) -> int:
    import jax

    from multimodal_classification_tpu.config import (
        core_vilbert_config,
        facebook_vilbert_config,
    )
    from multimodal_classification_tpu.models.convert import (
        convert_core_vilbert,
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
    convert = convert_facebook_vilbert if args.arch == "facebook" else convert_core_vilbert
    loaded = convert(sd, cfg)
    params, n, total = merge_params(init, loaded)
    print(f"loaded {n}/{total} tensors from {args.checkpoint}")

    ckpt = CheckpointManager(args.output)
    ckpt.save("best", {"params": params, "epoch": 0, "val_auroc": 0.0})
    print(f"wrote Orbax checkpoint → {args.output}/best")
    return 0


def _reverse(args) -> int:
    """Orbax checkpoint dir (as written by Trainer/CheckpointManager) →
    reference-layout torch .pt."""
    import jax

    from multimodal_classification_tpu.config import facebook_vilbert_config
    from multimodal_classification_tpu.models.convert import save_reference_checkpoint
    from multimodal_classification_tpu.models.vilbert import (
        ViLBERTForClassification,
        dummy_batch,
    )
    from multimodal_classification_tpu.utils.checkpoint import CheckpointManager

    if args.arch != "facebook":
        print("--reverse currently targets the facebook arch layout", file=sys.stderr)
        return 2

    cfg = facebook_vilbert_config()
    model = ViLBERTForClassification(cfg)
    init = model.init(jax.random.key(0), **dummy_batch(cfg, 1, 8, 8))["params"]
    ckpt = CheckpointManager(args.checkpoint)
    name = args.name or ("best" if ckpt.exists("best") else "last")
    restored = ckpt.restore(name, {"params": init, "epoch": 0, "val_auroc": 0.0})
    metrics = {"val_auroc": float(restored.get("val_auroc", 0.0))}
    save_reference_checkpoint(args.output, restored["params"], cfg, metrics=metrics)
    print(f"wrote reference-format torch checkpoint ('{name}') → {args.output}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="torch .pt/.bin (forward) or Orbax dir (--reverse)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--arch", choices=["facebook", "core"], default="facebook")
    ap.add_argument("--reverse", action="store_true",
                    help="export an Orbax checkpoint to the reference's torch format")
    ap.add_argument("--name", default=None,
                    help="--reverse: which saved state to export (default: best, else last)")
    args = ap.parse_args()
    return _reverse(args) if args.reverse else _forward(args)


if __name__ == "__main__":
    sys.exit(main())
