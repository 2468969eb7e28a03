"""Caption enrichment (CES) + text augmentation.

Reference: pipelines/data_processing/augmentation.py —
- ``enrich_with_captions``: BLIP captions appended as ``"text [SEP] caption"``
  with a CSV cache (+2–6%% AUROC claim, augmentation.py:190-251). The BLIP
  model requires a network download; offline, a pre-populated caption cache
  CSV works identically (the reference also reads its cache first).
- ``TextAugmenter``: WordNet synonym replacement and interior word shuffle
  (augmentation.py:109-187), seeded for reproducibility (the reference used
  the global ``random`` module).
"""

from __future__ import annotations

import logging
import os
import random
from typing import List, Mapping, Optional

import pandas as pd

logger = logging.getLogger(__name__)


def decode_caption_ids(ids, inv_vocab, eos_id: int, special) -> str:
    """Greedy-decoded token ids → caption text (WordPiece join)."""
    words: List[str] = []
    for i in ids:
        i = int(i)
        if i == eos_id:
            break
        if i in special:
            continue
        words.append(inv_vocab.get(i, "[UNK]"))
    out = ""
    for t in words:
        if t.startswith("##"):
            out += t[2:]
        else:
            out += (" " if out else "") + t
    return out


class JaxImageCaptioner:
    """TPU-native BLIP captioner (models/blip.py) — the reference's CES
    captioner (augmentation.py:24-106) without torch in the loop.

    ``checkpoint``: a local ``pytorch_model.bin`` of
    Salesforce/blip-image-captioning-base (download is network-gated);
    ``vocab_path``: the matching bert-base-uncased vocab.txt (+[DEC] row).
    Without a checkpoint the captioner still runs (random weights) — only
    useful for pipeline plumbing tests.
    """

    def __init__(self, checkpoint: Optional[str] = None,
                 vocab_path: Optional[str] = None, seed: int = 0):
        self.checkpoint = checkpoint
        self.vocab_path = vocab_path
        self.seed = seed
        self._model = None
        self._params = None
        self._inv_vocab = None

    def _load(self):
        if self._model is not None:
            return
        import jax

        from multimodal_classification_tpu.models.blip import (
            BlipConfig,
            BlipForCaptioning,
            convert_hf_blip,
        )

        cfg = BlipConfig()
        self._model = BlipForCaptioning(cfg)
        if self.checkpoint:
            from multimodal_classification_tpu.models.convert import (
                load_torch_checkpoint,
            )

            sd = load_torch_checkpoint(self.checkpoint)
            self._params = convert_hf_blip(sd, cfg)
        else:
            logger.warning("no BLIP checkpoint provided — random weights")
            self._params = self._model.init_params(jax.random.key(self.seed))
        if self.vocab_path and os.path.exists(self.vocab_path):
            with open(self.vocab_path) as f:
                vocab = {tok.rstrip("\n"): i for i, tok in enumerate(f)}
            self._inv_vocab = {v: k for k, v in vocab.items()}
        else:
            self._inv_vocab = {}

    def generate_captions(self, image_paths: List[str], batch_size: int = 8,
                          max_length: int = 24) -> List[str]:
        import numpy as np
        from PIL import Image

        from multimodal_classification_tpu.models.blip import (
            BLIP_BOS,
            BLIP_EOS,
            BLIP_PAD,
            preprocess_images,
        )

        self._load()
        cfg = self._model.cfg
        special = {BLIP_PAD, BLIP_BOS, cfg.bos_token_id, cfg.pad_token_id,
                   101}  # [CLS]
        captions: List[str] = []
        for start in range(0, len(image_paths), batch_size):
            paths = image_paths[start : start + batch_size]
            arrs = []
            for p in paths:
                try:
                    arrs.append(np.asarray(Image.open(p).convert("RGB")))
                except Exception as e:
                    logger.warning("failed to load %s: %s", p, e)
                    arrs.append(np.zeros((cfg.image_size, cfg.image_size, 3),
                                         np.uint8))
            # pad the final batch to the compiled batch shape
            n_real = len(arrs)
            while len(arrs) < batch_size:
                arrs.append(arrs[-1])
            imgs = preprocess_images(
                np.stack([np.asarray(Image.fromarray(a).resize(
                    (cfg.image_size, cfg.image_size))) for a in arrs]),
                cfg.image_size,
            )
            ids = np.asarray(self._model.generate_greedy_cached(
                self._params, imgs, max_length=max_length))
            for row in ids[:n_real]:
                captions.append(decode_caption_ids(
                    row, self._inv_vocab, cfg.eos_token_id, special))
        return captions


class ImageCaptioner:
    """BLIP captioner (lazy-loaded; network-gated in offline environments)."""

    def __init__(self, model_name: str = "Salesforce/blip-image-captioning-base"):
        self.model_name = model_name
        self._model = None
        self._processor = None

    def _load(self):
        if self._model is None:
            from transformers import BlipForConditionalGeneration, BlipProcessor

            self._processor = BlipProcessor.from_pretrained(self.model_name)
            self._model = BlipForConditionalGeneration.from_pretrained(self.model_name)
            self._model.eval()

    def generate_captions(self, image_paths: List[str], batch_size: int = 8,
                          max_length: int = 50) -> List[str]:
        import torch
        from PIL import Image

        self._load()
        captions: List[str] = []
        for start in range(0, len(image_paths), batch_size):
            paths = image_paths[start : start + batch_size]
            images = []
            for p in paths:
                try:
                    images.append(Image.open(p).convert("RGB"))
                except Exception as e:
                    logger.warning("failed to load %s: %s", p, e)
                    images.append(Image.new("RGB", (224, 224)))
            inputs = self._processor(images, return_tensors="pt", padding=True)
            with torch.no_grad():
                out = self._model.generate(**inputs, max_length=max_length)
            captions.extend(self._processor.batch_decode(out, skip_special_tokens=True))
        return captions


def enrich_with_captions(
    df: pd.DataFrame,
    params: Mapping,
    captioner: Optional[ImageCaptioner] = None,
) -> pd.DataFrame:
    """Append BLIP captions: ``text_clean`` → ``"text [SEP] caption"``.

    Caption cache CSV (columns id, caption) is read first and written after
    (reference augmentation.py:190-251) — in offline environments a
    pre-populated cache provides full functionality.
    """
    if not params.get("use_captions", False):
        return df
    df = df.copy()
    cache_path = params.get("caption_cache_path", "data/02_intermediate/captions.csv")
    cache: dict = {}
    if os.path.exists(cache_path):
        cdf = pd.read_csv(cache_path, dtype={"id": str})
        cache = dict(zip(cdf["id"], cdf["caption"]))

    need = [
        (str(row["id"]), row.get("img_path"))
        for _, row in df.iterrows()
        if str(row["id"]) not in cache
    ]
    need = [(i, p) for i, p in need if p and os.path.exists(str(p))]
    if need:
        try:
            captioner = captioner or ImageCaptioner()
            captions = captioner.generate_captions([p for _i, p in need])
            for (i, _p), cap in zip(need, captions):
                cache[i] = cap
            os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
            pd.DataFrame(
                {"id": list(cache), "caption": [cache[i] for i in cache]}
            ).to_csv(cache_path, index=False)
        except Exception as e:
            logger.warning(
                "caption generation unavailable (%s); using cache only (%d hits)",
                e, len(cache),
            )

    text_col = "text_clean" if "text_clean" in df.columns else "text"
    df[text_col] = [
        f"{t} [SEP] {cache[str(i)]}" if str(i) in cache else t
        for i, t in zip(df["id"], df[text_col])
    ]
    n = sum(1 for i in df["id"] if str(i) in cache)
    logger.info("caption enrichment: %d/%d rows enriched", n, len(df))
    return df


class TextAugmenter:
    """Seeded WordNet synonym replacement + interior word shuffle."""

    def __init__(self, seed: int = 42):
        self.rng = random.Random(seed)
        self._wordnet = None

    def _get_wordnet(self):
        if self._wordnet is None:
            import nltk
            from nltk.corpus import wordnet

            try:
                wordnet.synsets("test")
            except LookupError:
                nltk.download("wordnet", quiet=True)
                nltk.download("omw-1.4", quiet=True)
                wordnet.synsets("test")
            self._wordnet = wordnet
        return self._wordnet

    def augment_text(self, text: str, method: str = "synonym") -> str:
        if method == "synonym":
            return self.synonym_replacement(text)
        if method == "shuffle":
            return self.word_shuffle(text)
        return text

    def synonym_replacement(self, text: str, n: int = 2) -> str:
        try:
            wordnet = self._get_wordnet()
        except Exception as e:
            logger.debug("wordnet unavailable: %s", e)
            return text
        words = text.split()
        if len(words) < 2:
            return text
        replaceable = [i for i, w in enumerate(words) if len(w) > 3]
        if not replaceable:
            return text
        for idx in self.rng.sample(replaceable, min(n, len(replaceable))):
            word = words[idx].lower()
            synonyms = []
            for syn in wordnet.synsets(word)[:2]:
                for lemma in syn.lemmas():
                    name = lemma.name()
                    if name != word and "_" not in name:
                        synonyms.append(name)
            if synonyms:
                words[idx] = self.rng.choice(synonyms)
        return " ".join(words)

    def word_shuffle(self, text: str) -> str:
        words = text.split()
        if len(words) <= 3:
            return text
        middle = words[1:-1]
        self.rng.shuffle(middle)
        return " ".join([words[0]] + middle + [words[-1]])


def augment_dataset(
    df: pd.DataFrame, methods: List[str] = ("synonym",), seed: int = 42
) -> pd.DataFrame:
    """Expand a DataFrame with augmented copies (reference
    augmentation.py:254-295)."""
    aug = TextAugmenter(seed)
    text_col = "text_clean" if "text_clean" in df.columns else "text"
    frames = [df]
    for method in methods:
        copy = df.copy()
        copy[text_col] = [aug.augment_text(t, method) for t in copy[text_col]]
        frames.append(copy)
    return pd.concat(frames, ignore_index=True)
