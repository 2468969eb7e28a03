"""Model export: portable serving artifacts via ``jax.export`` (StableHLO).

The reference's deployment story ends at a pickled ``state_dict``
(``torch.save`` in pipelines/model_training/nodes.py:953-964) that can only
be revived by the full Python model code. The TPU-native packaging is a
**self-contained artifact directory**:

- ``eval_s<seq>.stablehlo`` — one serialized ``jax.export`` program per
  serving sequence bucket (fixed ``[batch, seq]`` shapes; XLA static shapes).
  The functions are the exact serving eval steps (optionally the int8 MXU
  path), so an exported artifact predicts bit-identically to the in-process
  server.
- ``params.npz`` — the parameter pytree flattened to ``a/b/c``-keyed arrays
  (flax param trees are nested dicts, so the tree rebuilds from key paths
  alone — no model code needed on the serving host).
- ``quant.npz`` — the int8 kernel collection, when exported with ``int8``.
- ``manifest.json`` — shapes, buckets, dtypes, platforms, versions.

A serving host loads with :func:`load_artifact` (jax + numpy only — none of
the model/config/extractor code) and serves through the same micro-batching
``InferenceServer``. StableHLO is the portability boundary: artifacts can be
exported for ``("tpu", "cpu")`` from either platform; per-host *compile* time
is the job of the persistent XLA compilation cache, not of this format.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_classification_tpu.serving.server import ServingModel

MANIFEST = "manifest.json"
FORMAT_VERSION = 1


def _flatten_params(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        keys = []
        for p in path:
            if not hasattr(p, "key"):
                raise ValueError(
                    f"only dict-of-dict pytrees export cleanly; got {p!r}")
            keys.append(str(p.key))
        flat["/".join(keys)] = np.asarray(leaf)
    return flat


def _unflatten_params(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for path, arr in flat.items():
        node = tree
        keys = path.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = jnp.asarray(arr)
    return tree


def _batch_spec(batch_size: int, seq: int, num_regions: int, feature_dim: int,
                feature_dtype) -> Dict[str, jax.ShapeDtypeStruct]:
    f32 = jnp.float32
    i32 = jnp.int32
    return {
        "input_ids": jax.ShapeDtypeStruct((batch_size, seq), i32),
        "attention_mask": jax.ShapeDtypeStruct((batch_size, seq), f32),
        "token_type_ids": jax.ShapeDtypeStruct((batch_size, seq), i32),
        "visual_features": jax.ShapeDtypeStruct(
            (batch_size, num_regions, feature_dim), feature_dtype),
        "visual_attention_mask": jax.ShapeDtypeStruct(
            (batch_size, num_regions), f32),
        "spatial_locations": jax.ShapeDtypeStruct((batch_size, num_regions, 5), f32),
    }


def export_artifact(
    model,
    params,
    out_dir: str,
    *,
    batch_size: int = 16,
    max_seq_length: int = 128,
    num_regions: int = 100,
    feature_dim: int = 2048,
    seq_buckets: Sequence[int] = (),
    int8: bool = False,
    int8_min_dim: int = 256,
    quant=None,
    platforms: Optional[Sequence[str]] = None,
    vocab_path: Optional[str] = None,
    lowercase: bool = True,
) -> Dict[str, Any]:
    """Serialize the serving eval step(s) + params into ``out_dir``.

    Returns the manifest dict. ``platforms=None`` exports for the current
    backend only; pass ``("tpu", "cpu")`` for a cross-platform artifact.
    ``quant`` overrides the freshly-built int8 tree — pass a CALIBRATED tree
    (``ops.quant.calibrate_quant_tree`` / ``ServingModel.calibrate``) to
    export the static-activation-scale program. ``vocab_path`` embeds the
    WordPiece vocab so the artifact is fully self-contained (a bare serving
    host then needs no project config — :func:`load_artifact` with
    ``tokenizer=None`` rebuilds it from the artifact).
    """
    from jax import export as jexport

    from multimodal_classification_tpu.training.train import (
        make_eval_step,
        make_quant_eval_step,
    )

    os.makedirs(out_dir, exist_ok=True)
    buckets = sorted({int(b) for b in seq_buckets if 0 < int(b) < max_seq_length})
    all_seqs = tuple(buckets) + (int(max_seq_length),)

    if int8:
        if quant is None:
            from multimodal_classification_tpu.ops.quant import build_quant_tree

            quant = build_quant_tree(params, min_dim=int8_min_dim)
        step = make_quant_eval_step(model)
    else:
        quant = None
        step = make_eval_step(model)

    spec = lambda t: jax.tree.map(  # noqa: E731
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), t)
    # ServingModel rounds visual features to the model compute dtype on the
    # HOST (its wire dtype — identical numerics, half the link bytes for
    # bf16 models); the exported program's input signature must match.
    feature_dtype = np.dtype(getattr(model.cfg, "dtype", "float32"))

    kw = {"platforms": tuple(platforms)} if platforms else {}
    programs = {}
    for seq in all_seqs:
        bspec = _batch_spec(batch_size, seq, num_regions, feature_dim, feature_dtype)
        if int8:
            exp = jexport.export(jax.jit(step), **kw)(spec(params), spec(quant), bspec)
        else:
            exp = jexport.export(jax.jit(step), **kw)(spec(params), bspec)
        fname = f"eval_s{seq}.stablehlo"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exp.serialize())
        programs[str(seq)] = fname

    flat = _flatten_params(params)
    np.savez(os.path.join(out_dir, "params.npz"), **flat)
    if quant is not None:
        np.savez(os.path.join(out_dir, "quant.npz"), **_flatten_params(quant))

    vocab_file = None
    if vocab_path:
        import shutil

        vocab_file = "vocab.txt"
        shutil.copyfile(vocab_path, os.path.join(out_dir, vocab_file))

    import hashlib

    digest = hashlib.sha256()
    for k in sorted(flat):
        digest.update(k.encode())
        digest.update(np.ascontiguousarray(flat[k]).tobytes())

    manifest = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "batch_size": int(batch_size),
        "max_seq_length": int(max_seq_length),
        "num_regions": int(num_regions),
        "feature_dim": int(feature_dim),
        "seq_buckets": [int(b) for b in buckets],
        "int8": bool(int8),
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "programs": programs,
        "vocab": vocab_file,
        "lowercase": bool(lowercase),
        "wire_dtype": feature_dtype.name,
        "params_sha256": digest.hexdigest(),
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedServingModel(ServingModel):
    """ServingModel over a deserialized artifact — no model code required.

    Same ``predict`` surface (padding, seq-bucket routing, zero-feature
    fallback) as the in-process :class:`ServingModel`; the compiled step per
    bucket comes from the artifact's StableHLO programs instead of tracing
    the flax model.
    """

    def __init__(self, artifact_dir: str, tokenizer=None, store=None,
                 *, batch_size: Optional[int] = None, verify: bool = True):
        from jax import export as jexport

        with open(os.path.join(artifact_dir, MANIFEST)) as f:
            man = json.load(f)
        if man.get("format_version") != FORMAT_VERSION:
            raise ValueError(f"unsupported artifact format: {man.get('format_version')}")
        if batch_size is not None and batch_size != man["batch_size"]:
            raise ValueError(
                f"artifact was exported at batch {man['batch_size']}; "
                f"re-export to serve at {batch_size}")
        if tokenizer is None:
            if not man.get("vocab"):
                raise ValueError(
                    "artifact has no embedded vocab (exported without "
                    "vocab_path) — pass a tokenizer")
            from multimodal_classification_tpu.data import load_tokenizer

            tokenizer = load_tokenizer(
                os.path.join(artifact_dir, man["vocab"]),
                man.get("lowercase", True))

        # ServingModel.__init__ builds a traced step from a model — bypass it
        # and fill the same attributes from the manifest.
        self._model = None  # no model code on the serving host (no calibrate())
        self.mesh = None  # serialized programs carry their own shardings
        self._batch_sharding = None
        self.tokenizer = tokenizer
        self.store = store
        self.max_seq_length = int(man["max_seq_length"])
        self.seq_buckets = tuple(int(b) for b in man["seq_buckets"]) + (
            self.max_seq_length,)
        self.num_regions = int(man["num_regions"])
        self.feature_dim = int(man["feature_dim"])
        self.batch_size = int(man["batch_size"])
        # serialized programs are fixed-batch; no per-size routing and no
        # device feature cache (the programs take inline feature tensors)
        self.batch_sizes = (self.batch_size,)
        self._cache = None
        self._cached_step = None
        self._wire_dtype = np.dtype(man.get("wire_dtype", "float32"))
        with np.load(os.path.join(artifact_dir, "params.npz")) as z:
            flat = dict(z)
        if verify and man.get("params_sha256"):
            import hashlib

            digest = hashlib.sha256()
            for k in sorted(flat):
                digest.update(k.encode())
                digest.update(np.ascontiguousarray(flat[k]).tobytes())
            if digest.hexdigest() != man["params_sha256"]:
                raise ValueError("params.npz does not match the manifest "
                                 "checksum — corrupt or tampered artifact")
        self.params = _unflatten_params(flat)
        self._quant = None
        if man["int8"]:
            with np.load(os.path.join(artifact_dir, "quant.npz")) as z:
                self._quant = _unflatten_params(dict(z))

        calls = {}
        for seq, fname in man["programs"].items():
            with open(os.path.join(artifact_dir, fname), "rb") as f:
                exp = jexport.deserialize(f.read())
            calls[int(seq)] = jax.jit(exp.call)
        if man["int8"]:
            def step(params, quant, batch):
                return calls[batch["input_ids"].shape[1]](params, quant, batch)
        else:
            def step(params, batch):
                return calls[batch["input_ids"].shape[1]](params, batch)
        self._step = step
        self.manifest = man


def load_artifact(artifact_dir: str, tokenizer=None, store=None) -> ExportedServingModel:
    """Load an exported artifact directory into a serving-ready model.

    ``tokenizer=None`` rebuilds the tokenizer from the artifact's embedded
    vocab (exports made with ``vocab_path``); ``store=None`` serves requests
    that carry inline ``features`` (unknown ids get the zero-feature
    fallback)."""
    return ExportedServingModel(artifact_dir, tokenizer, store)
