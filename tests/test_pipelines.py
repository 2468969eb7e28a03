"""End-to-end pipeline tests: the vilbert_lmdb_train slice (fabricated
detectron.lmdb + JSONL splits + tiny model) through training, validation, and
inference — the reference's minimum end-to-end path (SURVEY.md §7 step 3)."""

import json
import os

import numpy as np
import pytest

from multimodal_classification_tpu.data.lmdb_store import write_feature_lmdb
from multimodal_classification_tpu.data.tokenizer import build_test_vocab
from multimodal_classification_tpu.pipelines.base import (
    run_data_processing,
    run_inference_pipeline,
    run_training_pipeline,
    run_validation_pipeline,
)
from multimodal_classification_tpu.registry import list_available_pipelines
from multimodal_classification_tpu.utils.tracking import Tracker
from tests.fixtures import make_dataset_dir


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    """Fabricated project root: dataset JSONLs + LMDB features + vocab."""
    root = tmp_path_factory.mktemp("proj")
    data_dir = root / "data/01_raw/hateful_memes"
    data_dir.mkdir(parents=True)
    _, dfs = make_dataset_dir(data_dir, n_train=48, n_val=24, n_test=24)

    # features with injected label signal so the tiny model can learn
    all_ids, all_labels = [], []
    for df in dfs.values():
        all_ids += df["id"].tolist()
        all_labels += df["label"].tolist()
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((len(all_ids), 10, 128)).astype(np.float32)
    feats[:, :, :8] += np.asarray(all_labels, np.float32)[:, None, None] * 4.0
    boxes = rng.uniform(0, 1000, (len(all_ids), 10, 4)).astype(np.float32)
    lmdb_dir = root / "data/01_raw/lmdb_features"
    lmdb_dir.mkdir(parents=True)
    write_feature_lmdb(str(lmdb_dir / "detectron.lmdb"), all_ids, feats, boxes)

    vocab = build_test_vocab()
    vocab_path = root / "vocab.txt"
    with open(vocab_path, "w") as f:
        for tok in sorted(vocab, key=vocab.get):
            f.write(tok + "\n")

    params = {
        "data_processing": {
            "data_dir": "data/01_raw/hateful_memes",
            "use_dev_as_val": True,
            "random_seed": 42,
            "lowercase": True,
        },
        "training": {
            "batch_size": 16,
            "num_epochs": 6,
            "learning_rate": 1.0e-3,
            "warmup_steps": 4,
            "early_stopping_patience": 5,
            "loss_type": "ce",
            "mesh_shape": [-1, 1],
        },
        "vilbert": {
            "max_seq_length": 16,
            "max_regions": 10,
            "tokenizer_vocab": str(vocab_path),
            "output_dir": "data/05_model_output",
            # tiny model dims (facebook topology)
            "hidden_size": 32, "num_attention_heads": 2, "num_hidden_layers": 2,
            "intermediate_size": 64, "vocab_size": len(vocab),
            "v_hidden_size": 32, "v_num_attention_heads": 2,
            "v_num_hidden_layers": 1, "v_intermediate_size": 32,
            "bi_hidden_size": 32, "bi_num_attention_heads": 2,
            "co_attention_text_layers": [1], "v_feature_size": 128,
            "classifier_hidden_size": 32, "dtype": "float32",
            "use_pallas_attention": False,
        },
        "vilbert_lmdb": {
            "lmdb_path": "data/01_raw/lmdb_features/detectron.lmdb",
            "output_dir": "data/05_model_output/lmdb",
        },
        "training_lmdb": {"batch_size": 16},
    }
    return str(root), params


class TestRegistry:
    def test_all_reference_pipeline_names_present(self):
        names = set(list_available_pipelines())
        for required in [
            "__default__", "data_processing", "vilbert", "vilbert_train",
            "vilbert_frcnn_train", "vilbert_frcnn_resnet152_train",
            "vilbert_dinov2_train", "vilbert_dinov2_multilayer_train",
            "vilbert_vg_train", "vilbert_vg_rpn_train", "vilbert_resnet_vg_train",
            "vilbert_resnet152_grid_train", "vilbert_resnet152_roi_train",
            "vilbert_precomputed_train", "vilbert_lmdb_train", "vilbert_x152_train",
            "vilbert_validate", "vilbert_inference", "vilbert_inference_local",
            "model_training", "model_training_lmdb", "model_validation",
            "model_inference", "model_inference_local",
        ]:
            assert required in names, required


class TestPrecomputedPipeline:
    def test_hdf5_precomputed_training(self, project, tmp_path):
        """vilbert_precomputed_train: HDF5 store → training (reference:
        precomputed_dataset.py path)."""
        from multimodal_classification_tpu.data import write_hdf5_features

        root, params = project
        splits = run_data_processing(params, root)
        all_ids = [i for df in splits.values() for i in df["id"].astype(str)]
        labels = {str(r["id"]): int(r["label"]) for df in splits.values()
                  for _, r in df.iterrows()}
        rng = np.random.default_rng(1)
        feats = rng.standard_normal((len(all_ids), 10, 128)).astype(np.float32)
        for k, i in enumerate(all_ids):
            feats[k, :, :8] += labels[i] * 4.0
        spatial = rng.uniform(0, 1, (len(all_ids), 10, 5)).astype(np.float32)
        h5 = str(tmp_path / "precomputed.h5")
        write_hdf5_features(h5, all_ids, feats, spatial)

        params = {
            **params,
            "vilbert_precomputed": {
                "hdf5_features_path": h5,
                "output_dir": str(tmp_path / "out"),
            },
            "training_precomputed": {"batch_size": 16, "num_epochs": 4},
        }
        result = run_training_pipeline("precomputed", params, root)
        assert result["history"]["val_auroc"][-1] > 0.8


class TestLmdbTrainPipeline:
    def test_data_processing(self, project):
        root, params = project
        splits = run_data_processing(params, root)
        assert set(splits) == {"train", "val", "test"}
        info = json.load(open(os.path.join(root, "data/08_reporting/data_splits_info.json")))
        assert info["train"]["num_samples"] == 48

    def test_train_evaluate_save(self, project):
        root, params = project
        lmdb_abs = os.path.join(root, "data/01_raw/lmdb_features/detectron.lmdb")
        params = {**params, "vilbert_lmdb": {**params["vilbert_lmdb"], "lmdb_path": lmdb_abs}}
        tracker = Tracker(root=os.path.join(root, "mlruns"), experiment="test")
        result = run_training_pipeline("lmdb", params, root, tracker)
        assert len(result["history"]["val_auroc"]) >= 1
        assert result["history"]["val_auroc"][-1] > 0.8  # signal is learnable
        assert result["test_metrics"]["auroc"] > 0.8
        for artifact in (
            "data/08_reporting/training_history.json",
            "data/08_reporting/test_metrics.json",
            "data/08_reporting/model_path.txt",
        ):
            assert os.path.exists(os.path.join(root, artifact)), artifact
        # mlruns file-store has per-epoch metrics
        exp_dirs = [d for d in os.listdir(os.path.join(root, "mlruns"))]
        assert exp_dirs

    def test_validate_pipeline_restores_checkpoint(self, project):
        root, params = project
        lmdb_abs = os.path.join(root, "data/01_raw/lmdb_features/detectron.lmdb")
        params = {**params, "vilbert_lmdb": {**params["vilbert_lmdb"], "lmdb_path": lmdb_abs}}
        metrics = run_validation_pipeline("lmdb", params, root)
        assert metrics["auroc"] > 0.8
        assert os.path.exists(os.path.join(root, "data/08_reporting/validation_metrics.json"))

    def test_device_resident_training(self, project, tmp_path):
        """HBM-resident dataset path (single-device mesh)."""
        root, params = project
        lmdb_abs = os.path.join(root, "data/01_raw/lmdb_features/detectron.lmdb")
        params = {
            **params,
            "vilbert_lmdb": {
                **params["vilbert_lmdb"], "lmdb_path": lmdb_abs,
                "device_resident": True,
                "output_dir": str(tmp_path / "out"),
            },
            "training_lmdb": {"batch_size": 16, "mesh_shape": [1, 1], "num_epochs": 3},
        }
        result = run_training_pipeline("lmdb", params, root)
        assert result["history"]["val_auroc"][-1] > 0.8
        assert result["test_metrics"]["auroc"] > 0.8

    def test_ablation_config_plumbing(self, project, tmp_path):
        """The reference's ablation axes reach the engine through config:
        focal loss + frozen BERT layers + label smoothing (README.md:289-291)."""
        root, params = project
        lmdb_abs = os.path.join(root, "data/01_raw/lmdb_features/detectron.lmdb")
        params = {
            **params,
            "vilbert_lmdb": {
                **params["vilbert_lmdb"], "lmdb_path": lmdb_abs,
                "freeze_bert_layers": 1,
                "output_dir": str(tmp_path / "out"),
            },
            "training_lmdb": {
                "batch_size": 16, "num_epochs": 2,
                "loss_type": "focal", "focal_alpha": 0.35, "focal_gamma": 2.0,
            },
        }
        result = run_training_pipeline("lmdb", params, root)
        assert np.isfinite(result["history"]["train_loss"]).all()

    def test_ablation_variant_routes_to_base_feature_source(self, project, tmp_path):
        """Regression: 'lmdb_freeze6'/'lmdb_b32'/'lmdb_focal' must source
        features exactly like 'lmdb' — a TPU run caught them falling through
        to the default extractor (random weights, zero features) because the
        variant name wasn't in PRECOMPUTED_VARIANTS."""
        from multimodal_classification_tpu.config import (
            base_variant,
            experiment_from_parameters,
        )
        from multimodal_classification_tpu.data.lmdb_store import LMDBFeatureStore
        from multimodal_classification_tpu.pipelines.base import make_feature_store

        assert base_variant("lmdb_freeze6") == "lmdb"
        assert base_variant("resnet152_roi_focal") == "resnet152_roi"
        assert base_variant("lmdb") == "lmdb"

        root, params = project
        for variant in ("lmdb_freeze6", "lmdb_b32", "lmdb_focal"):
            ex = experiment_from_parameters(params, variant)
            store = make_feature_store(variant, ex, root)
            assert isinstance(store, LMDBFeatureStore), variant

    def test_lmdb_freeze6_trains_end_to_end(self, project, tmp_path):
        """The ablation pipeline itself (not just its options) recovers the
        injected signal; the ablation block only states its axis — base
        blocks (vilbert_lmdb) merge in underneath."""
        root, params = project
        params = {
            **params,
            "vilbert_lmdb_freeze6": {
                "freeze_bert_layers": 1,
                "output_dir": str(tmp_path / "out"),
            },
            "training_lmdb_freeze6": {"num_epochs": 3},
        }
        result = run_training_pipeline("lmdb_freeze6", params, root)
        assert np.isfinite(result["history"]["train_loss"]).all()
        assert result["history"]["val_auroc"][-1] > 0.8

    def test_pipeline_resume_continues(self, project):
        """--resume product surface: a 2-epoch run's 'last' checkpoint is
        continued by a second invocation with resume=True (full state)."""
        root, params = project
        lmdb_abs = os.path.join(root, "data/01_raw/lmdb_features/detectron.lmdb")
        p = {**params,
             "vilbert_lmdb": {**params["vilbert_lmdb"], "lmdb_path": lmdb_abs,
                              "output_dir": "data/05_model_output/resume_t"},
             "training_lmdb": {**params["training_lmdb"], "num_epochs": 2,
                               "early_stopping_patience": 50}}
        out1 = run_training_pipeline("lmdb", p, root)
        assert len(out1["history"]["train_loss"]) == 2
        p4 = {**p, "training_lmdb": {**p["training_lmdb"], "num_epochs": 4}}
        out2 = run_training_pipeline("lmdb", p4, root, resume=True)
        # continued from epoch 3: history carries the first run's epochs
        assert len(out2["history"]["train_loss"]) == 4
        assert out2["history"]["train_loss"][:2] == out1["history"]["train_loss"]

    def test_validate_without_checkpoint_fails_hard(self, project, tmp_path):
        """Missing 'best' checkpoint must raise (reference load_trained_model
        semantics, nodes.py:325-348) — not silently score the untrained
        model. output_dir is overridden to an empty dir so this is
        order-independent of the training tests."""
        root, params = project
        lmdb_abs = os.path.join(root, "data/01_raw/lmdb_features/detectron.lmdb")
        params = {**params, "vilbert_lmdb": {
            **params["vilbert_lmdb"], "lmdb_path": lmdb_abs,
            "output_dir": str(tmp_path / "no_ckpt")}}
        with pytest.raises(FileNotFoundError, match="best"):
            run_validation_pipeline("lmdb", params, root)
        with pytest.raises(FileNotFoundError, match="best"):
            run_inference_pipeline("lmdb", params, root,
                                   use_local_checkpoint=True)

    def test_inference_pipeline_writes_predictions(self, project):
        root, params = project
        lmdb_abs = os.path.join(root, "data/01_raw/lmdb_features/detectron.lmdb")
        params = {**params, "vilbert_lmdb": {**params["vilbert_lmdb"], "lmdb_path": lmdb_abs}}
        df = run_inference_pipeline("lmdb", params, root)
        assert len(df) == 24
        assert {"id", "probability", "prediction", "label"} <= set(df.columns)
        assert os.path.exists(os.path.join(root, "data/07_model_output/predictions.csv"))


class TestEveryVariantConfigBuilds:
    """Breadth gate: every registered pipeline name resolves to a callable,
    and every training variant's shipped config block (conf/base/
    parameters.yml) produces a constructible model + a registered feature
    extractor + a registered loss — so no --pipeline flag can hit an
    unresolvable config at runtime."""

    def test_every_registered_name_resolves(self):
        from multimodal_classification_tpu.registry import get_pipeline

        for name in list_available_pipelines():
            assert callable(get_pipeline(name)), name

    def test_every_train_variant_config_builds(self):
        import multimodal_classification_tpu.extractors  # noqa: F401 registry fill
        from multimodal_classification_tpu.config import (
            base_variant,
            experiment_from_parameters,
            load_parameters,
        )
        from multimodal_classification_tpu.models.vilbert import ViLBERTForClassification
        from multimodal_classification_tpu.pipelines import _TRAIN_VARIANTS
        from multimodal_classification_tpu.pipelines.base import EXTRACTOR_VARIANTS
        from multimodal_classification_tpu.registry import (
            FEATURE_EXTRACTOR_REGISTRY,
            LOSS_REGISTRY,
        )

        params = load_parameters(
            os.path.join(os.path.dirname(__file__), "..", "conf", "base", "parameters.yml")
        )
        for variant in _TRAIN_VARIANTS:
            ex = experiment_from_parameters(params, variant)
            model = ViLBERTForClassification(ex.model)
            assert model.cfg.num_labels == 2, variant
            feature_variant = base_variant(variant)
            if feature_variant not in ("lmdb", "lmdb_b32", "precomputed"):
                name = EXTRACTOR_VARIANTS.get(feature_variant, ex.data.feature_extractor)
                assert name in FEATURE_EXTRACTOR_REGISTRY, (variant, name)
            assert ex.training.loss_type in LOSS_REGISTRY, (variant, ex.training.loss_type)

    def test_int8_serving_inference_agrees_with_float(self, project):
        """serving_int8 runs the whole inference pipeline through the int8
        MXU path (ops/quant.py) and must reproduce the float pipeline's
        predictions on the separable fixture."""
        root, params = project
        lmdb_abs = os.path.join(root, "data/01_raw/lmdb_features/detectron.lmdb")
        base = {**params["vilbert_lmdb"], "lmdb_path": lmdb_abs}
        p_float = {**params, "vilbert_lmdb": base}
        p_int8 = {**params, "vilbert_lmdb": {**base, "serving_int8": True,
                                             "serving_int8_min_dim": 16}}
        # use_local_checkpoint=False: the assertion is float-vs-int8
        # prediction agreement, which needs no trained checkpoint (and this
        # keeps the test independent of the slow-tier training tests)
        df_f = run_inference_pipeline("lmdb", p_float, root,
                                      use_local_checkpoint=False)
        df_q = run_inference_pipeline("lmdb", p_int8, root,
                                      use_local_checkpoint=False)
        agree = (df_f["prediction"].values == df_q["prediction"].values).mean()
        assert agree >= 0.95, agree
        # probabilities track closely, not just the argmax
        assert np.abs(df_f["probability"].values - df_q["probability"].values).max() < 0.15
