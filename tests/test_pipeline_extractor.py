"""End-to-end on-the-fly extractor pipeline: fabricated images → batched
ResNet grid extraction → ViLBERT training (the reference's vilbert_train
path, minus downloads)."""

import os

import numpy as np
import pytest

from multimodal_classification_tpu.data.tokenizer import build_test_vocab
from multimodal_classification_tpu.pipelines.base import run_training_pipeline
from tests.fixtures import make_dataset_dir


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("proj_ex")
    data_dir = root / "data/01_raw/hateful_memes"
    (data_dir / "img").mkdir(parents=True)
    _, dfs = make_dataset_dir(data_dir, n_train=24, n_val=12, n_test=12)
    rng = np.random.default_rng(0)
    for df in dfs.values():
        for _, row in df.iterrows():
            # label-correlated brightness so the tiny model can learn
            base = 40 + int(row["label"]) * 120
            arr = np.clip(
                rng.normal(base, 30, (48, 48, 3)), 0, 255
            ).astype(np.uint8)
            Image.fromarray(arr).save(data_dir / "img" / f"{row['id']}.png")

    vocab = build_test_vocab()
    vocab_path = root / "vocab.txt"
    with open(vocab_path, "w") as f:
        for tok in sorted(vocab, key=vocab.get):
            f.write(tok + "\n")

    params = {
        "data_processing": {"data_dir": "data/01_raw/hateful_memes", "lowercase": True},
        "training": {
            "batch_size": 8, "num_epochs": 2, "learning_rate": 1e-3,
            "warmup_steps": 2, "loss_type": "ce", "mesh_shape": [-1, 1],
        },
        "vilbert": {
            "max_seq_length": 12, "max_regions": 4,
            "tokenizer_vocab": str(vocab_path),
            "feature_extractor": "resnet",
            "extractor_kwargs": {"arch": "resnet50", "image_size": 48,
                                 "grid_size": 2, "dtype": "float32"},
            "hidden_size": 32, "num_attention_heads": 2, "num_hidden_layers": 2,
            "intermediate_size": 64, "vocab_size": len(vocab),
            "v_hidden_size": 32, "v_num_attention_heads": 2,
            "v_num_hidden_layers": 1, "v_intermediate_size": 32,
            "bi_hidden_size": 32, "bi_num_attention_heads": 2,
            "co_attention_text_layers": [1], "v_feature_size": 2048,
            "classifier_hidden_size": 32, "dtype": "float32",
            "use_pallas_attention": False,
        },
    }
    return str(root), params


def test_on_the_fly_extractor_training(project):
    root, params = project
    result = run_training_pipeline("", params, root)
    assert len(result["history"]["val_auroc"]) >= 1
    # random-weight extractor on brightness-separated images still carries
    # signal; just require a finite, non-degenerate run + artifacts
    assert np.isfinite(result["history"]["train_loss"][-1])
    assert os.path.exists(os.path.join(root, "data/08_reporting/training_history.json"))
    # the extractor store produced a persistent HDF5 cache
    assert os.path.exists(os.path.join(root, "data/02_intermediate/features_resnet.h5"))
