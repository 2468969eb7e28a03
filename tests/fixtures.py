"""Shared test fixtures: fabricated Hateful-Memes datasets and feature stores
(the reference's real data requires ~11GB of downloads; shapes/conventions
match lmdb_dataset.py / precomputed_dataset.py exactly)."""

import json
import os

import numpy as np
import pandas as pd

WORDS = ["the", "meme", "is", "hateful", "not", "love", "hate", "people", "a", "this"]


def make_memes_df(n: int, seed: int = 0, with_labels: bool = True) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        text = " ".join(rng.choice(WORDS, size=rng.integers(3, 10)))
        row = {"id": str(10000 + i), "img": f"img/{10000 + i}.png", "text": text}
        if with_labels:
            row["label"] = int(rng.uniform() < 0.355)
        rows.append(row)
    return pd.DataFrame(rows)


def write_jsonl(df: pd.DataFrame, path: str):
    with open(path, "w") as f:
        for _, row in df.iterrows():
            f.write(json.dumps({k: v for k, v in row.items() if pd.notna(v)}) + "\n")


def make_feature_arrays(ids, num_regions=36, dim=128, seed=0, label_signal=None):
    """Random features; optionally inject a per-id label signal so tiny models
    can actually learn (mirrors a real extractor carrying class information)."""
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((len(ids), num_regions, dim)).astype(np.float32)
    spatial = rng.uniform(0, 1, (len(ids), num_regions, 5)).astype(np.float32)
    if label_signal is not None:
        for i, lbl in enumerate(label_signal):
            feats[i, :, 0] += float(lbl) * 3.0
    return feats, spatial


def make_dataset_dir(tmp_path, n_train=64, n_val=32, n_test=32, seed=0):
    d = str(tmp_path)
    train = make_memes_df(n_train, seed)
    val = make_memes_df(n_val, seed + 1)
    test = make_memes_df(n_test, seed + 2)
    val["id"] = [str(20000 + i) for i in range(n_val)]
    test["id"] = [str(30000 + i) for i in range(n_test)]
    write_jsonl(train, os.path.join(d, "train.jsonl"))
    write_jsonl(val, os.path.join(d, "dev.jsonl"))
    write_jsonl(test, os.path.join(d, "test.jsonl"))
    return d, {"train": train, "val": val, "test": test}
