#!/usr/bin/env python
"""Download pretrained ViLBERT weights (reference: scripts/download_weights.py).

Sources (same as the reference):
- vilbert_cc: Facebook Conceptual-Captions pretraining checkpoint
  https://dl.fbaipublicfiles.com/vilbert-multi-task/pretrained_model.bin
- vilbert_multi_task: multi-task checkpoint
  https://dl.fbaipublicfiles.com/vilbert-multi-task/multi_task_model.bin
- hf: visualjoyce/transformers4vl-vilbert from the HF Hub

After download, convert to native params with scripts/convert_checkpoint.py.
Offline environments: place the .bin under --output and this script verifies it.
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

URLS = {
    "vilbert_cc": (
        "https://dl.fbaipublicfiles.com/vilbert-multi-task/pretrained_model.bin",
        "vilbert_pretrained_cc.bin",
    ),
    "vilbert_multi_task": (
        "https://dl.fbaipublicfiles.com/vilbert-multi-task/multi_task_model.bin",
        "vilbert_multi_task.bin",
    ),
}


def verify(path: str) -> bool:
    """Light checkpoint validation: torch-loadable with bert.* keys."""
    try:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model_state_dict" in sd:
            sd = sd["model_state_dict"]
        keys = list(sd)
        ok = any(k.startswith("bert.") for k in keys)
        print(f"verified {path}: {len(keys)} tensors, bert.* present={ok}")
        return ok
    except Exception as e:
        print(f"verification failed for {path}: {e}", file=sys.stderr)
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", choices=[*URLS, "hf"], default="vilbert_cc")
    ap.add_argument("--output", default="weights")
    args = ap.parse_args()
    os.makedirs(args.output, exist_ok=True)

    if args.source == "hf":
        try:
            from huggingface_hub import snapshot_download

            path = snapshot_download("visualjoyce/transformers4vl-vilbert")
            print(f"downloaded to {path}")
            return 0
        except Exception as e:
            print(f"HF download failed (offline environment?): {e}", file=sys.stderr)
            return 1

    url, fname = URLS[args.source]
    dest = os.path.join(args.output, fname)
    if os.path.exists(dest):
        print(f"{dest} already exists")
        return 0 if verify(dest) else 1
    try:
        print(f"downloading {url} → {dest}")
        urllib.request.urlretrieve(url, dest)
    except Exception as e:
        print(
            f"download failed ({e}). This environment may be offline — place the "
            f"checkpoint manually at {dest}.",
            file=sys.stderr,
        )
        return 1
    return 0 if verify(dest) else 1


if __name__ == "__main__":
    sys.exit(main())
