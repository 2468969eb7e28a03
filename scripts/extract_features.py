#!/usr/bin/env python
"""Offline feature precompute: run an extractor over every dataset image and
persist an HDF5 feature store (reference: scripts/extract_features.py —
feeds the ``vilbert_precomputed_train`` pipeline).

Fully offline: uses the batched jitted extractors (the reference looped one
image at a time through torch).

Usage:
  python scripts/extract_features.py --extractor resnet152_roi \
      --data-dir data/01_raw/hateful_memes \
      --output data/02_intermediate/precomputed_features.h5
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--extractor", default="fasterrcnn_vg")
    ap.add_argument("--data-dir", default="data/01_raw/hateful_memes")
    ap.add_argument("--output", default="data/02_intermediate/precomputed_features.h5")
    ap.add_argument("--max-regions", type=int, default=36)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--checkpoint", default=None, help="torch weights to convert+load")
    args = ap.parse_args()

    from multimodal_classification_tpu.data.memes import load_hateful_memes
    from multimodal_classification_tpu.extractors.store import ExtractorFeatureStore

    splits = load_hateful_memes(args.data_dir)
    ids, paths = [], []
    for df in splits.values():
        for _, row in df.iterrows():
            ids.append(str(row["id"]))
            paths.append(row.get("img", f"img/{row['id']}.png"))

    kwargs = {}
    if args.checkpoint:
        kwargs["checkpoint"] = args.checkpoint
    store = ExtractorFeatureStore(
        args.extractor,
        image_root=args.data_dir,
        max_regions=args.max_regions,
        cache_path=args.output,
        extractor_kwargs=kwargs,
        batch_size=args.batch_size,
    )
    n = store.precompute(ids, paths, persist=True)
    print(f"extracted {n} new items → {args.output} "
          f"({store.num_regions}×{store.feature_dim})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
