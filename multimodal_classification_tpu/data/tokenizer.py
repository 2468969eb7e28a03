"""Native WordPiece tokenizer (BERT-exact, offline).

The reference tokenizes with HF ``BertTokenizer.from_pretrained("bert-base-
uncased")`` inside every Dataset (lmdb_dataset.py:273, nodes.py:110-127),
which requires network access. This is a dependency-free implementation of
the same algorithm (BasicTokenizer + WordPiece greedy longest-match, HF/
Google-BERT semantics) over a local ``vocab.txt``; when a HF cache happens to
be present, :func:`load_tokenizer` will also accept the HF fast tokenizer.

Encoding contract (identical to the reference datasets): fixed
``max_length``, ``[CLS] tokens [SEP]`` + ``[PAD]``, attention mask 1 for real
tokens, token_type_ids all 0.
"""

from __future__ import annotations

import os
import unicodedata
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np


def _is_whitespace(ch: str) -> bool:
    return ch in " \t\n\r" or unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F or 0x2B740 <= cp <= 0x2B81F
        or 0x2B820 <= cp <= 0x2CEAF or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


class WordPieceTokenizer:
    def __init__(
        self,
        vocab: Dict[str, int],
        lowercase: bool = True,
        unk_token: str = "[UNK]",
        max_chars_per_word: int = 100,
    ):
        self.vocab = vocab
        self.inv_vocab = {v: k for k, v in vocab.items()}
        self.lowercase = lowercase
        self.unk_token = unk_token
        self.max_chars_per_word = max_chars_per_word
        self.cls_id = vocab["[CLS]"]
        self.sep_id = vocab["[SEP]"]
        self.pad_id = vocab.get("[PAD]", 0)
        self.unk_id = vocab[unk_token]

    @classmethod
    def from_vocab_file(cls, path: str, lowercase: bool = True) -> "WordPieceTokenizer":
        vocab: Dict[str, int] = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                tok = line.rstrip("\n")
                if tok:
                    vocab[tok] = i
        return cls(vocab, lowercase=lowercase)

    # -- basic tokenization ---------------------------------------------
    def _clean(self, text: str) -> str:
        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or _is_control(ch):
                continue
            out.append(" " if _is_whitespace(ch) else ch)
        return "".join(out)

    def _strip_accents(self, text: str) -> str:
        return "".join(
            ch for ch in unicodedata.normalize("NFD", text)
            if unicodedata.category(ch) != "Mn"
        )

    def basic_tokenize(self, text: str) -> List[str]:
        text = self._clean(text)
        # CJK spacing
        spaced = []
        for ch in text:
            if _is_cjk(ord(ch)):
                spaced.extend((" ", ch, " "))
            else:
                spaced.append(ch)
        tokens = "".join(spaced).split()
        out: List[str] = []
        for tok in tokens:
            if self.lowercase:
                tok = self._strip_accents(tok.lower())
            # split on punctuation
            cur: List[str] = []
            for ch in tok:
                if _is_punctuation(ch):
                    if cur:
                        out.append("".join(cur))
                        cur = []
                    out.append(ch)
                else:
                    cur.append(ch)
            if cur:
                out.append("".join(cur))
        return out

    # -- wordpiece -------------------------------------------------------
    def wordpiece(self, word: str) -> List[str]:
        if len(word) > self.max_chars_per_word:
            return [self.unk_token]
        pieces: List[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk_token]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for word in self.basic_tokenize(text):
            out.extend(self.wordpiece(word))
        return out

    # -- encoding --------------------------------------------------------
    def encode(
        self, text: str, max_length: int = 128
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """→ (input_ids, attention_mask, token_type_ids), each [max_length]."""
        ids = [self.vocab.get(t, self.unk_id) for t in self.tokenize(text)]
        ids = ids[: max_length - 2]
        ids = [self.cls_id] + ids + [self.sep_id]
        n = len(ids)
        input_ids = np.full(max_length, self.pad_id, np.int32)
        input_ids[:n] = ids
        mask = np.zeros(max_length, np.float32)
        mask[:n] = 1.0
        return input_ids, mask, np.zeros(max_length, np.int32)

    def encode_batch(self, texts: Iterable[str], max_length: int = 128):
        enc = [self.encode(t, max_length) for t in texts]
        return (
            np.stack([e[0] for e in enc]),
            np.stack([e[1] for e in enc]),
            np.stack([e[2] for e in enc]),
        )


def build_test_vocab(extra_words: Optional[List[str]] = None) -> Dict[str, int]:
    """Small deterministic vocab for tests/fixtures: specials + a–z chars +
    '##'-continuations + common words."""
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    tokens += list("abcdefghijklmnopqrstuvwxyz0123456789")
    tokens += ["##" + c for c in "abcdefghijklmnopqrstuvwxyz0123456789"]
    tokens += [".", ",", "!", "?", "'"]
    tokens += ["the", "a", "meme", "is", "this", "hateful", "not", "love", "hate",
               "people", "##s", "##ing", "##ed"]
    if extra_words:
        tokens += [w for w in extra_words if w not in tokens]
    return {t: i for i, t in enumerate(tokens)}


def load_tokenizer(
    vocab_path: Optional[str] = None, lowercase: bool = True, native: bool = True
) -> WordPieceTokenizer:
    """Load from an explicit vocab.txt, a cached HF bert-base-uncased vocab if
    present, or fail with a clear message. ``native=True`` (default) uses the
    C++ batch-encoding kernel when it builds (data/tokenizer_native.py) —
    observably identical output, ~50× faster on the 1-core host."""

    def _make(path: str):
        py = WordPieceTokenizer.from_vocab_file(path, lowercase)
        if native:
            from multimodal_classification_tpu.data.tokenizer_native import (
                native_or_python_tokenizer,
            )

            return native_or_python_tokenizer(py.vocab, lowercase)
        return py

    if vocab_path and os.path.exists(vocab_path):
        return _make(vocab_path)
    # look through the HF cache for a bert vocab.txt
    cache = os.path.expanduser(os.environ.get("HF_HOME", "~/.cache/huggingface"))
    for root, _dirs, files in os.walk(cache) if os.path.isdir(cache) else []:
        if "vocab.txt" in files and "bert-base-uncased" in root:
            return _make(os.path.join(root, "vocab.txt"))
    raise FileNotFoundError(
        "No tokenizer vocab found: pass DataConfig.tokenizer_vocab=<path to "
        "bert vocab.txt> (offline environment; HF download unavailable)"
    )
