#!/usr/bin/env python
"""Download the Hateful Memes dataset + images and write dataset_stats.json
(reference: download_hateful_memes.py at the repo root — HF dataset
``neuralcatcher/hateful_memes`` + image tarball from Google Drive, per-file
fallback from ``limjiayi/hateful_memes_expanded``).

Offline environments: place the official JSONL files (train.jsonl,
dev[_seen].jsonl, test[_seen].jsonl) and img/ directory under --output; this
script then only validates and writes stats (expected full-dataset values:
train 8500 / 35.5%% hateful, val 1040, test 3000).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default="data/01_raw/hateful_memes")
    ap.add_argument("--skip-download", action="store_true")
    ap.add_argument("--skip-images", action="store_true",
                    help="metadata/stats only (the LMDB-features training "
                    "path needs no images)")
    args = ap.parse_args()
    os.makedirs(args.output, exist_ok=True)

    have_local = os.path.exists(os.path.join(args.output, "train.jsonl"))
    if not have_local and not args.skip_download:
        try:
            from datasets import load_dataset

            ds = load_dataset("neuralcatcher/hateful_memes")
            for split, fname in (("train", "train.jsonl"), ("validation", "dev.jsonl"),
                                 ("test", "test.jsonl")):
                if split not in ds:
                    continue
                with open(os.path.join(args.output, fname), "w") as f:
                    for row in ds[split]:
                        f.write(json.dumps(dict(row)) + "\n")
        except Exception as e:
            print(
                f"download failed ({e}). Offline? Place train.jsonl/dev.jsonl/"
                f"test.jsonl + img/ under {args.output}.",
                file=sys.stderr,
            )
            return 1

    from multimodal_classification_tpu.data.memes import (
        compute_dataset_statistics,
        load_hateful_memes,
        preprocess_data,
    )

    splits = load_hateful_memes(args.output)

    if not args.skip_download and not args.skip_images:
        # GDrive tarball + per-image HTTP fallback
        # (reference data_processing/nodes.py:111-167)
        from multimodal_classification_tpu.data.images import acquire_images

        names = [n for df in splits.values() if "img" in df.columns
                 for n in df["img"]]
        img_stats = acquire_images(args.output, names)
        print(f"images: {img_stats}")
    splits = {k: preprocess_data(v, {}) for k, v in splits.items()}
    stats = compute_dataset_statistics(splits)
    out = os.path.join(args.output, "dataset_stats.json")
    with open(out, "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
