"""Hateful Memes metadata ingest, splits, and text preprocessing.

Offline-first re-design of the reference data_processing nodes
(reference: pipelines/data_processing/nodes.py): primary source is the
official JSONL format (``train.jsonl`` / ``dev.jsonl`` / ``test.jsonl`` with
``id, img, text[, label]``); the HF ``neuralcatcher/hateful_memes`` path
(nodes.py:63-108) is kept behind a network-gated loader. Splits and cleaning
match the reference exactly: stratified 10% carve-out at seed 42 when no dev
split is used (nodes.py:194-246), strip/optional-lowercase/char-truncate
cleaning (nodes.py:249-277).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

REQUIRED_COLUMNS = ("id", "text")


def load_jsonl(path: str) -> pd.DataFrame:
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    df = pd.DataFrame(rows)
    for col in REQUIRED_COLUMNS:
        if col not in df.columns:
            raise ValueError(f"{path} missing required column '{col}'")
    return df


def load_hateful_memes(
    data_dir: str,
    use_dev_as_val: bool = True,
    val_split_ratio: float = 0.1,
    random_seed: int = 42,
) -> Dict[str, pd.DataFrame]:
    """Load train/val/test DataFrames from a local dataset directory.

    Accepts the official layout (train.jsonl + dev[_seen].jsonl +
    test[_seen].jsonl). When no dev file exists (or use_dev_as_val=False),
    carves a stratified ``val_split_ratio`` out of train at ``random_seed``
    (reference: nodes.py:194-246 create_train_val_split).
    """
    def find(*names) -> Optional[str]:
        for n in names:
            p = os.path.join(data_dir, n)
            if os.path.exists(p):
                return p
        return None

    train_path = find("train.jsonl")
    if train_path is None:
        raise FileNotFoundError(f"no train.jsonl under {data_dir}")
    train = load_jsonl(train_path)
    dev_path = find("dev_seen.jsonl", "dev.jsonl")
    test_path = find("test_seen.jsonl", "test.jsonl")
    test = load_jsonl(test_path) if test_path else pd.DataFrame(columns=list(train.columns))

    if use_dev_as_val and dev_path:
        val = load_jsonl(dev_path)
    else:
        train, val = create_train_val_split(train, val_split_ratio, random_seed)

    # dedup across splits by id (the reference dedups HF splits, nodes.py:84-101)
    seen = set(val["id"]) | set(test["id"]) if len(test) else set(val["id"])
    train = train[~train["id"].isin(seen)].reset_index(drop=True)

    for name, df in (("train", train), ("val", val), ("test", test)):
        df.attrs["split"] = name
    logger.info("splits: train=%d val=%d test=%d", len(train), len(val), len(test))
    return {"train": train, "val": val, "test": test}


def create_train_val_split(
    df: pd.DataFrame, val_ratio: float = 0.1, seed: int = 42
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Stratified split on label (reference seed 42, nodes.py:202)."""
    rng = np.random.default_rng(seed)
    if "label" in df.columns and df["label"].notna().all():
        val_idx = []
        for _lbl, grp in df.groupby("label"):
            k = int(round(len(grp) * val_ratio))
            val_idx.extend(rng.choice(grp.index.to_numpy(), size=k, replace=False))
        val_mask = df.index.isin(val_idx)
    else:
        val_mask = rng.uniform(size=len(df)) < val_ratio
    val = df[val_mask].reset_index(drop=True)
    train = df[~val_mask].reset_index(drop=True)
    return train, val


def preprocess_data(df: pd.DataFrame, params: Mapping[str, Any]) -> pd.DataFrame:
    """Clean text → ``text_clean`` column; validate image paths
    (reference: nodes.py:249-277)."""
    df = df.copy()
    max_length = int(params.get("max_text_length", 512))
    lowercase = bool(params.get("lowercase", False))

    def clean_text(text) -> str:
        if not isinstance(text, str):
            return ""
        text = text.strip()
        if lowercase:
            text = text.lower()
        if len(text) > max_length * 4:
            text = text[: max_length * 4]
        return text

    df["text_clean"] = df["text"].apply(clean_text)
    if "img_path" in df.columns:
        df["img_exists"] = df["img_path"].apply(os.path.exists)
        missing = int((~df["img_exists"]).sum())
        if missing:
            logger.warning("%d images not found", missing)
    return df


def attach_image_paths(df: pd.DataFrame, data_dir: str) -> pd.DataFrame:
    """Absolute ``img_path`` from the relative ``img`` column
    (reference: nodes.py builds abs img_path after download)."""
    df = df.copy()
    if "img" in df.columns:
        df["img_path"] = df["img"].apply(lambda p: os.path.join(data_dir, str(p)))
    return df


def compute_dataset_statistics(splits: Mapping[str, pd.DataFrame]) -> Dict[str, Any]:
    """Per-split counts + hateful ratio (reference: nodes.py:311-350;
    expected full-dataset values: 8500/1040/3000, 35.5%% hateful train)."""
    stats: Dict[str, Any] = {}
    for name, df in splits.items():
        entry: Dict[str, Any] = {"num_samples": int(len(df))}
        if "label" in df.columns and len(df) and df["label"].notna().any():
            labels = df["label"].dropna().astype(int)
            entry["num_hateful"] = int((labels == 1).sum())
            entry["hateful_ratio"] = float((labels == 1).mean()) if len(labels) else 0.0
        if "text_clean" in df.columns and len(df):
            entry["avg_text_chars"] = float(df["text_clean"].str.len().mean())
        stats[name] = entry
    return stats


def load_from_huggingface(dataset_name: str = "neuralcatcher/hateful_memes"):
    """Network path (reference: nodes.py:63-108). Gated: raises a clear error
    in offline environments instead of hanging."""
    try:
        from datasets import load_dataset

        return load_dataset(dataset_name)
    except Exception as e:  # pragma: no cover - network-dependent
        raise RuntimeError(
            f"HuggingFace dataset download failed ({e}); this environment is "
            "offline — provide local JSONL files via load_hateful_memes()"
        ) from e
