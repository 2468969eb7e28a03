"""Pipeline building blocks: the reference's node functions re-designed.

A pipeline here is a plain function over (params, root_dir, tracker) —
deterministic orchestration without the Kedro runtime, but preserving the
reference's artifact surface (reference: conf/base/catalog.yml):
``data_splits_info.json``, ``training_history.json``, ``test_metrics.json``,
``validation_metrics.json``, ``predictions.csv``, ``model_path.txt`` under
``data/``, plus mlruns metrics.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np
import pandas as pd

from multimodal_classification_tpu.config import (
    ExperimentConfig,
    experiment_from_parameters,
)
from multimodal_classification_tpu.data import (
    BatchLoader,
    HDF5FeatureStore,
    MemesDataset,
    WordPieceTokenizer,
    compute_dataset_statistics,
    load_hateful_memes,
    load_tokenizer,
    preprocess_data,
)
from multimodal_classification_tpu.data.features import FeatureStore
from multimodal_classification_tpu.training.train import Trainer, model_inputs
from multimodal_classification_tpu.utils.tracking import NullTracker, Tracker

logger = logging.getLogger(__name__)

# variant → how visual features are sourced
PRECOMPUTED_VARIANTS = {"lmdb": "lmdb", "precomputed": "hdf5"}
EXTRACTOR_VARIANTS = {
    "": "resnet",
    "frcnn": "fasterrcnn",
    "frcnn_resnet152": "fasterrcnn_resnet152",
    "dinov2": "dinov2",
    "dinov2_multilayer": "dinov2_multilayer",
    "vg": "fasterrcnn_vg",
    "vg_rpn": "fasterrcnn_vg_rpn",
    "resnet_vg": "resnet_vg",
    "resnet152_grid": "resnet",
    "resnet152_roi": "resnet152_roi",
    "x152": "grid_x152",
}


DEFAULT_CATALOG = {
    "data_splits_info": "data/08_reporting/data_splits_info.json",
    "training_history": "data/08_reporting/training_history.json",
    "test_metrics": "data/08_reporting/test_metrics.json",
    "validation_metrics": "data/08_reporting/validation_metrics.json",
    "inference_metrics": "data/08_reporting/inference_metrics.json",
    "predictions": "data/07_model_output/predictions.csv",
    "model_path": "data/08_reporting/model_path.txt",
}


def catalog_path(name: str, root: str = ".") -> str:
    """Artifact path from conf/base/catalog.yml (reference catalog.yml:4-73),
    falling back to the reference's default layout."""
    import yaml

    mapping = dict(DEFAULT_CATALOG)
    cat_file = os.path.join(root, "conf", "base", "catalog.yml")
    if os.path.exists(cat_file):
        with open(cat_file) as f:
            mapping.update(yaml.safe_load(f) or {})
    return os.path.join(root, mapping[name])


def _write_json(path: str, obj: Any):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, default=float)


def run_data_processing(
    params: Mapping[str, Any], root: str = "."
) -> Dict[str, pd.DataFrame]:
    """Load + split + clean (reference: data_processing pipeline). Emits
    ``data/08_reporting/data_splits_info.json`` (catalog.yml:28-30)."""
    dp = dict(params.get("data_processing", {}) or {})
    data_dir = os.path.join(root, dp.get("data_dir", "data/01_raw/hateful_memes"))
    splits = load_hateful_memes(
        data_dir,
        use_dev_as_val=dp.get("use_dev_as_val", True),
        val_split_ratio=dp.get("val_split_ratio", 0.1),
        random_seed=dp.get("random_seed", 42),
    )
    from multimodal_classification_tpu.data.memes import attach_image_paths

    splits = {k: attach_image_paths(v, data_dir) for k, v in splits.items()}
    splits = {k: preprocess_data(v, dp) for k, v in splits.items()}
    if dp.get("use_captions", False):
        from multimodal_classification_tpu.data.augment import enrich_with_captions

        splits = {k: enrich_with_captions(v, dp) for k, v in splits.items()}
    stats = compute_dataset_statistics(splits)
    _write_json(catalog_path("data_splits_info", root), stats)
    return splits


def _resolve(path: Optional[str], root: str, default: str) -> str:
    path = path or default
    return path if os.path.isabs(path) else os.path.join(root, path)


def make_feature_store(
    variant: str, ex: ExperimentConfig, root: str = "."
) -> Optional[FeatureStore]:
    """Feature source for a pipeline variant: LMDB / HDF5 precomputed / an
    extractor-backed store (batched + cached — the reference extracted
    per-image inside __getitem__, nodes.py:129-148). Ablation variants
    (``lmdb_freeze6``) source features like their base variant."""
    from multimodal_classification_tpu.config import base_variant

    feature_variant = base_variant(variant)
    if feature_variant in PRECOMPUTED_VARIANTS:
        if feature_variant == "lmdb":
            from multimodal_classification_tpu.data.lmdb_store import LMDBFeatureStore

            return LMDBFeatureStore(
                _resolve(ex.data.lmdb_path, root,
                         "data/01_raw/lmdb_features/detectron.lmdb")
            )
        return HDF5FeatureStore(
            _resolve(ex.data.hdf5_features_path, root,
                     "data/02_intermediate/precomputed_features.h5")
        )
    extractor_name = EXTRACTOR_VARIANTS.get(feature_variant, ex.data.feature_extractor)
    from multimodal_classification_tpu.extractors.store import ExtractorFeatureStore

    return ExtractorFeatureStore(
        extractor_name,
        image_root=os.path.join(root, ex.data.data_dir),
        max_regions=ex.data.max_regions,
        cache_path=os.path.join(root, f"data/02_intermediate/features_{extractor_name}.h5"),
        extractor_kwargs=dict(ex.data.extractor_kwargs),
    )


def build_datasets(
    splits: Mapping[str, pd.DataFrame],
    ex: ExperimentConfig,
    store: Optional[FeatureStore],
    tokenizer: Optional[WordPieceTokenizer] = None,
    root: str = ".",
) -> Dict[str, MemesDataset]:
    vocab = ex.data.tokenizer_vocab
    if vocab and not os.path.isabs(vocab):
        vocab = os.path.join(root, vocab)
    tok = tokenizer or load_tokenizer(vocab, ex.data.lowercase)
    num_regions = getattr(store, "num_regions", ex.data.max_regions)
    feat_dim = getattr(store, "feature_dim", ex.data.visual_feature_dim)
    return {
        name: MemesDataset(
            df, tok, store,
            max_seq_length=ex.data.max_seq_length,
            max_regions=num_regions,
            feature_dim=feat_dim,
        )
        for name, df in splits.items()
        if len(df)
    }


def build_model_and_params(ex: ExperimentConfig, root: str = "."):
    from multimodal_classification_tpu.models.vilbert import (
        ViLBERTForClassification,
        dummy_batch,
    )

    model = ViLBERTForClassification(ex.model)
    batch = dummy_batch(ex.model, 1, ex.data.max_seq_length, ex.data.max_regions)
    params = model.init(jax.random.key(ex.training.seed), **batch)["params"]

    ckpt = ex.pretrained_checkpoint
    if ckpt:
        path = ckpt if os.path.isabs(ckpt) else os.path.join(root, ckpt)
        if os.path.exists(path):
            from multimodal_classification_tpu.models.convert import (
                convert_core_vilbert,
                convert_facebook_vilbert,
                load_torch_checkpoint,
                merge_params,
            )

            sd = load_torch_checkpoint(path)
            # FB asymmetric arch uses shared bi-attention (pooling="cls");
            # the core/HF variant has per-direction cross-attention
            convert = (
                convert_facebook_vilbert if ex.model.pooling == "cls" else convert_core_vilbert
            )
            loaded = convert(sd, ex.model)
            params, n, total = merge_params(params, loaded)
            logger.info("loaded %d/%d param tensors from %s", n, total, path)
        else:
            logger.warning("pretrained checkpoint %s not found; fresh init", path)
    return model, params


def run_training_pipeline(
    variant: str,
    params: Mapping[str, Any],
    root: str = ".",
    tracker: Optional[Tracker] = None,
    splits: Optional[Mapping[str, pd.DataFrame]] = None,
    store: Optional[FeatureStore] = None,
    tokenizer=None,
    resume: bool = False,
) -> Dict[str, Any]:
    """data → loaders → model → train → evaluate → save
    (the reference's 5-node training template, model_training/pipeline.py:51-87).

    ``resume=True`` (CLI: ``mmc-tpu run --resume``) continues from the "last"
    full-state checkpoint — e.g. after a TPU preemption (the Trainer
    checkpoints on SIGTERM and exits cleanly)."""
    ex = experiment_from_parameters(params, variant)
    tracker = tracker or NullTracker()
    tracker.start_run(run_name=ex.name)
    try:
        if splits is None:
            splits = run_data_processing(params, root)
        if store is None:
            store = make_feature_store(variant, ex, root)
        if hasattr(store, "precompute"):
            # batched extraction for all images up front + HDF5 persistence
            # (replaces the reference's per-image __getitem__ extraction)
            ids, paths = [], []
            for df in splits.values():
                ids.extend(df["id"].astype(str).tolist())
                paths.extend(df.get("img", df["id"]).astype(str).tolist())
            n = store.precompute(ids, paths, persist=True)
            logger.info("precomputed features for %d images", n)
        datasets = build_datasets(splits, ex, store, tokenizer, root)
        loaders = {
            name: BatchLoader(
                ds, ex.training.batch_size, shuffle=(name == "train"),
                seed=ex.training.seed, prefetch=ex.data.prefetch_depth,
                wire_dtype=ex.data.wire_dtype if ex.model.dtype == "bfloat16" else None,
                text_bucket_multiple=getattr(ex.data, "text_bucket_multiple", 0),
            )
            for name, ds in datasets.items()
        }
        model, init_params = build_model_and_params(ex, root)
        out_dir = os.path.join(root, ex.output_dir)
        trainer = Trainer(model, ex, tracker=tracker, checkpoint_dir=out_dir)
        # device-resident training shards the dataset over dp (any dp size);
        # mp>1 needs the host-fed fit() path (tensor-parallel params)
        use_device_resident = (
            ex.data.device_resident
            and trainer.mesh.shape.get("mp", 1) == 1
        )
        if use_device_resident:
            state, history = trainer.fit_device_resident(
                datasets["train"], datasets["val"], init_params, resume=resume
            )
        else:
            state, history = trainer.fit(
                loaders["train"], loaders["val"],
                steps_per_epoch=len(loaders["train"]),
                init_params=init_params,
                resume=resume,
            )
        _write_json(catalog_path("training_history", root), history)

        test_metrics: Dict[str, Any] = {}
        if "test" in loaders and datasets["test"].labels.max() >= 0:
            test_metrics = trainer.evaluate(state.params, loaders["test"])
            tracker.log_metrics({f"test_{k}": v for k, v in test_metrics.items()
                                 if isinstance(v, (int, float))})
            _write_json(catalog_path("test_metrics", root), test_metrics)

        # save_model equivalent (reference nodes.py:953-964 + model_path.txt)
        model_path = os.path.join(out_dir, "best")
        mp = catalog_path("model_path", root)
        os.makedirs(os.path.dirname(mp), exist_ok=True)
        with open(mp, "w") as f:
            f.write(model_path)
        tracker.end_run()
        return {"history": history, "test_metrics": test_metrics, "model_path": model_path}
    except Exception:
        tracker.end_run("FAILED")
        raise


def run_validation_pipeline(
    variant: str,
    params: Mapping[str, Any],
    root: str = ".",
    tracker: Optional[Tracker] = None,
    splits=None,
    store=None,
    tokenizer=None,
) -> Dict[str, Any]:
    """Load trained checkpoint → evaluate on test
    (reference: vilbert_validate, pipeline.py:262-285)."""
    ex = experiment_from_parameters(params, variant)
    tracker = tracker or NullTracker()
    if splits is None:
        splits = run_data_processing(params, root)
    if store is None:
        store = make_feature_store(variant, ex, root)
    datasets = build_datasets(splits, ex, store, tokenizer, root)
    loader = BatchLoader(datasets["test"], ex.training.batch_size,
                         text_bucket_multiple=ex.data.text_bucket_multiple)
    model, params_tree = build_model_and_params(ex, root)
    trainer = Trainer(model, ex, tracker=tracker,
                      checkpoint_dir=os.path.join(root, ex.output_dir))
    if not trainer.ckpt.exists("best"):
        # the reference's load_trained_model fails hard on a missing
        # checkpoint (nodes.py:325-348) — silently evaluating the untrained
        # model would report garbage metrics as if they were real
        raise FileNotFoundError(
            f"no 'best' checkpoint under {os.path.join(root, ex.output_dir)} "
            f"— run the training pipeline first (vilbert_{variant or 'lmdb'}"
            f"_train)")
    params_tree = trainer.ckpt.restore("best")["params"]
    eval_step = None
    if ex.serving_int8:
        from multimodal_classification_tpu.ops.quant import build_quant_tree
        from multimodal_classification_tpu.training.train import make_quant_eval_step

        quant = build_quant_tree(params_tree, min_dim=ex.serving_int8_min_dim)
        _step = jax.jit(make_quant_eval_step(model))

        def eval_step(p, b):
            return _step(p, quant, b)
    metrics = trainer.evaluate(params_tree, loader, eval_step)
    _write_json(catalog_path("validation_metrics", root), metrics)
    return metrics


def run_inference_pipeline(
    variant: str,
    params: Mapping[str, Any],
    root: str = ".",
    use_local_checkpoint: bool = True,
    splits=None,
    store=None,
    tokenizer=None,
    tracker: Optional[Tracker] = None,
) -> pd.DataFrame:
    """Predictions DataFrame + CSV (reference: run_inference nodes.py:967-1009,
    predictions.csv catalog.yml:61-63). Metrics are logged to the tracker when
    labels exist (reference nodes.py:997-1003 logs inference_* to MLflow)."""
    ex = experiment_from_parameters(params, variant)
    tracker = tracker or NullTracker()
    if splits is None:
        splits = run_data_processing(params, root)
    if store is None:
        store = make_feature_store(variant, ex, root)
    datasets = build_datasets(splits, ex, store, tokenizer, root)
    ds = datasets["test"]
    loader = BatchLoader(ds, ex.training.batch_size,
                         text_bucket_multiple=ex.data.text_bucket_multiple)
    model, params_tree = build_model_and_params(ex, root)
    trainer = Trainer(model, ex, checkpoint_dir=os.path.join(root, ex.output_dir))
    if use_local_checkpoint:
        if not trainer.ckpt.exists("best"):
            # mirrors the reference's inference_local: load_trained_model
            # fails hard when the local checkpoint is absent (the HF-weights
            # mode, vilbert_inference, passes use_local_checkpoint=False)
            raise FileNotFoundError(
                f"no 'best' checkpoint under "
                f"{os.path.join(root, ex.output_dir)} — train first or use "
                f"the vilbert_inference (non-local) pipeline")
        params_tree = trainer.ckpt.restore("best")["params"]

    from multimodal_classification_tpu.training.train import (
        make_eval_step,
        make_quant_eval_step,
    )

    if ex.serving_int8:
        from multimodal_classification_tpu.ops.quant import build_quant_tree

        quant = build_quant_tree(params_tree, min_dim=ex.serving_int8_min_dim)
        _step = jax.jit(make_quant_eval_step(model))

        def eval_step(p, b):
            return _step(p, quant, b)
    else:
        eval_step = jax.jit(make_eval_step(model))
    rows = []
    i = 0
    for batch in loader:
        logits = np.asarray(eval_step(params_tree, trainer.put_batch(model_inputs(batch))))
        keep = batch["weights"] > 0
        z = logits - logits.max(-1, keepdims=True)
        p = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
        for j in np.nonzero(keep)[0]:
            # column names match the reference's run_inference DataFrame
            # (nodes.py:990: "prediction", "probability" [+ "label"])
            rows.append(
                {
                    "id": ds.ids[i],
                    "prediction": int(np.argmax(p[j])),
                    "probability": float(p[j, 1]),
                    "label": int(batch["labels"][j]),
                }
            )
            i += 1
    df = pd.DataFrame(rows)
    out = catalog_path("predictions", root)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    df.to_csv(out, index=False)
    if (df["label"] >= 0).all() and df["label"].nunique() > 1:
        from multimodal_classification_tpu.training.metrics import binary_metrics

        m = binary_metrics(df["label"].to_numpy(), df["probability"].to_numpy())
        _write_json(catalog_path("inference_metrics", root), m)
        tracker.log_metrics({f"inference_{k}": v for k, v in m.items()
                             if isinstance(v, (int, float))})
    return df
