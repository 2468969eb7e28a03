#!/usr/bin/env python
"""Download + unpack Facebook's detectron.lmdb region features
(reference: scripts/download_lmdb.py — ~10GB tarball
https://dl.fbaipublicfiles.com/mmf/data/datasets/hateful_memes/defaults/features/features_2020_10_01.tar.gz).

Offline environments: place the extracted ``detectron.lmdb`` (the data.mdb
file or its directory) under --output; this script then verifies it with the
native reader (no py-lmdb needed).
"""

from __future__ import annotations

import argparse
import os
import sys
import tarfile
import urllib.request

URL = (
    "https://dl.fbaipublicfiles.com/mmf/data/datasets/hateful_memes/defaults/"
    "features/features_2020_10_01.tar.gz"
)


def verify(path: str) -> bool:
    from multimodal_classification_tpu.data.lmdb_store import open_lmdb

    try:
        reader = open_lmdb(path)
        n = getattr(reader, "entries", None)
        print(f"LMDB ok: {n} entries")
        return True
    except Exception as e:
        print(f"LMDB verification failed: {e}", file=sys.stderr)
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default="data/01_raw/lmdb_features")
    args = ap.parse_args()
    os.makedirs(args.output, exist_ok=True)
    lmdb_path = os.path.join(args.output, "detectron.lmdb")
    if os.path.exists(lmdb_path):
        return 0 if verify(lmdb_path) else 1
    tar_path = os.path.join(args.output, "features_2020_10_01.tar.gz")
    if not os.path.exists(tar_path):
        try:
            print(f"downloading {URL} (~10GB)")
            urllib.request.urlretrieve(URL, tar_path)
        except Exception as e:
            print(
                f"download failed ({e}). Offline? Place detectron.lmdb at "
                f"{lmdb_path} manually.",
                file=sys.stderr,
            )
            return 1
    print("extracting…")
    with tarfile.open(tar_path) as tf:
        tf.extractall(args.output)
    return 0 if verify(lmdb_path) else 1


if __name__ == "__main__":
    sys.exit(main())
