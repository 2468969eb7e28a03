"""ctypes binding for the native C++ WordPiece tokenizer.

``NativeWordPieceTokenizer`` wraps ``native/wordpiece_tokenizer.cc`` behind
the same ``encode``/``encode_batch`` contract as the pure-Python
:class:`~multimodal_classification_tpu.data.tokenizer.WordPieceTokenizer`
(reference tokenization semantics: HF BertTokenizer inside the datasets,
lmdb_dataset.py:273). The C++ path handles ASCII text; any text the kernel
rejects (non-ASCII) is re-encoded with the Python implementation, so the
wrapper is observably identical to the Python tokenizer on ALL input.

The host feeding the TPU has one CPU core — batch tokenization here runs
~30-80× faster than the per-character Python loops, which matters for the
host-fed loader path and for bulk dataset preprocessing.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from multimodal_classification_tpu.data.tokenizer import WordPieceTokenizer

logger = logging.getLogger(__name__)


def _native_dir() -> str:
    env = os.environ.get("MMC_TPU_NATIVE_DIR")
    if env:
        return env
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(os.path.dirname(os.path.dirname(here)), "native")


def build_native_tokenizer(force: bool = False) -> Optional[str]:
    """Compile native/wordpiece_tokenizer.cc → native/build/libwordpiece.so.
    Returns the .so path, or None if no source/compiler available."""
    ndir = _native_dir()
    src = os.path.join(ndir, "wordpiece_tokenizer.cc")
    if not os.path.exists(src):
        return None
    out_dir = os.path.join(ndir, "build")
    os.makedirs(out_dir, exist_ok=True)
    so = os.path.join(out_dir, "libwordpiece.so")
    if not force and os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", so, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native tokenizer build failed (%s); using python tokenizer", e)
        return None
    return so


def _vocab_lines(vocab: Dict[str, int]) -> bytes:
    """Serialise a token→id dict to the vocab.txt line format (id = line
    index; unassigned ids become empty lines, which the C++ loader skips
    while still advancing the line counter)."""
    if not vocab:
        raise ValueError("empty vocab")
    n = max(vocab.values()) + 1
    lines: List[Optional[str]] = [None] * n
    for tok, i in vocab.items():
        if i < 0 or lines[i] is not None:
            raise ValueError("native tokenizer requires unique non-negative ids")
        lines[i] = tok
    return ("\n".join(t if t is not None else "" for t in lines)).encode("utf-8")


class NativeWordPieceTokenizer:
    """Drop-in replacement for WordPieceTokenizer backed by the C++ kernel.

    Exposes the same attributes (vocab, cls_id, …) and the same
    encode/encode_batch/tokenize API; tokenize() and non-ASCII texts go
    through the Python implementation (identical semantics, see the C++
    header comment).
    """

    def __init__(self, vocab: Dict[str, int], lowercase: bool = True,
                 so_path: Optional[str] = None):
        so = so_path or build_native_tokenizer()
        if so is None:
            raise RuntimeError("native tokenizer unavailable")
        lib = ctypes.CDLL(so)
        lib.mmc_tok_create.restype = ctypes.c_void_p
        lib.mmc_tok_create.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int]
        lib.mmc_tok_destroy.argtypes = [ctypes.c_void_p]
        lib.mmc_tok_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        self._lib = lib
        blob = _vocab_lines(vocab)
        self._handle = lib.mmc_tok_create(blob, len(blob), int(lowercase))
        if not self._handle:
            raise ValueError("vocab is missing [CLS]/[SEP]/[UNK]")
        # Python twin: tokenize() + the non-ASCII fallback
        self._py = WordPieceTokenizer(vocab, lowercase=lowercase)
        self.vocab = vocab
        self.inv_vocab = self._py.inv_vocab
        self.lowercase = lowercase
        self.cls_id = self._py.cls_id
        self.sep_id = self._py.sep_id
        self.pad_id = self._py.pad_id
        self.unk_id = self._py.unk_id

    def __del__(self):
        lib = getattr(self, "_lib", None)
        handle = getattr(self, "_handle", None)
        if lib is not None and handle:
            lib.mmc_tok_destroy(handle)
            self._handle = None

    @classmethod
    def from_vocab_file(cls, path: str, lowercase: bool = True) -> "NativeWordPieceTokenizer":
        return cls(WordPieceTokenizer.from_vocab_file(path, lowercase).vocab, lowercase)

    def tokenize(self, text: str) -> List[str]:
        return self._py.tokenize(text)

    def encode(self, text: str, max_length: int = 128) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        ids, mask, typ = self.encode_batch([text], max_length)
        return ids[0], mask[0], typ[0]

    def encode_batch(self, texts: Iterable[str], max_length: int = 128):
        texts = list(texts)
        n = len(texts)
        raw = [t.encode("utf-8") for t in texts]
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum([len(r) for r in raw], out=offsets[1:])
        blob = b"".join(raw)
        ids = np.empty((n, max_length), np.int32)
        mask = np.empty((n, max_length), np.float32)
        rcs = np.empty(n, np.int32)
        self._lib.mmc_tok_encode_batch(
            self._handle, blob,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, max_length,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        for i in np.nonzero(rcs)[0]:  # non-ASCII → python fallback, per text
            ids[i], mask[i], _ = self._py.encode(texts[i], max_length)
        return ids, mask, np.zeros((n, max_length), np.int32)


def native_or_python_tokenizer(vocab: Dict[str, int], lowercase: bool = True):
    """Best tokenizer available: the C++ one when it builds, else Python."""
    try:
        return NativeWordPieceTokenizer(vocab, lowercase)
    except (RuntimeError, OSError, ValueError):
        return WordPieceTokenizer(vocab, lowercase)
