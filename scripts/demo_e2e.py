#!/usr/bin/env python
"""End-to-end demo on a fabricated project: the full product surface in one
run. Fabricates a Hateful-Memes-shaped project (JSONL splits + a real-format
detectron.lmdb with an injected label signal + vocab), then drives:

  data_processing → vilbert_lmdb_train → vilbert_validate →
  vilbert_inference_local → plots → (optional) one ServingModel prediction

and prints the artifact paths + key metrics. Works on any live backend
(CPU or TPU); with the signal-injected features, test AUROC should exceed
0.9 in a few epochs. This is also the maintenance entry point for driving
the framework after changes (see .claude/skills/verify).

Usage: python scripts/demo_e2e.py [workdir] [--keep]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# DEMO_PLATFORM=cpu forces the backend via jax.config (the JAX_PLATFORMS env
# var is latched before this script runs when a sitecustomize pre-imports jax)
if os.environ.get("DEMO_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["DEMO_PLATFORM"])

import numpy as np
import yaml


def fabricate(root: str, n_train=48, n_val=24, n_test=24, regions=10, dim=128):
    from multimodal_classification_tpu.data.lmdb_store import write_feature_lmdb
    from multimodal_classification_tpu.data.tokenizer import build_test_vocab
    from tests.fixtures import make_dataset_dir

    data_dir = os.path.join(root, "data/01_raw/hateful_memes")
    os.makedirs(data_dir, exist_ok=True)
    _, dfs = make_dataset_dir(data_dir, n_train=n_train, n_val=n_val, n_test=n_test)
    ids, labels = [], []
    for df in dfs.values():
        ids += df["id"].tolist()
        labels += df["label"].tolist()
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((len(ids), regions, dim)).astype(np.float32)
    feats[:, :, :8] += np.asarray(labels, np.float32)[:, None, None] * 4.0
    boxes = rng.uniform(0, 1000, (len(ids), regions, 4)).astype(np.float32)
    lmdb_dir = os.path.join(root, "data/01_raw/lmdb_features")
    os.makedirs(lmdb_dir, exist_ok=True)
    write_feature_lmdb(os.path.join(lmdb_dir, "detectron.lmdb"), ids, feats, boxes)

    vocab = build_test_vocab()
    with open(os.path.join(root, "vocab.txt"), "w") as f:
        for tok in sorted(vocab, key=vocab.get):
            f.write(tok + "\n")

    params = {
        "data_processing": {"data_dir": "data/01_raw/hateful_memes",
                            "use_dev_as_val": True, "random_seed": 42,
                            "lowercase": True},
        "training": {"batch_size": 16, "num_epochs": 5, "learning_rate": 1.0e-3,
                     "warmup_steps": 4, "early_stopping_patience": 5,
                     "loss_type": "ce", "mesh_shape": [-1, 1]},
        "vilbert": {
            "max_seq_length": 16, "max_regions": regions,
            "tokenizer_vocab": "vocab.txt",
            "output_dir": "data/05_model_output",
            "hidden_size": 32, "num_attention_heads": 2, "num_hidden_layers": 2,
            "intermediate_size": 64, "vocab_size": len(vocab),
            "v_hidden_size": 32, "v_num_attention_heads": 2,
            "v_num_hidden_layers": 1, "v_intermediate_size": 32,
            "bi_hidden_size": 32, "bi_num_attention_heads": 2,
            "co_attention_text_layers": [1], "v_feature_size": dim,
            "classifier_hidden_size": 32, "dtype": "float32",
        },
        "vilbert_lmdb": {"lmdb_path": "data/01_raw/lmdb_features/detectron.lmdb",
                         "output_dir": "data/05_model_output/lmdb"},
        "training_lmdb": {"batch_size": 16},
    }
    conf = os.path.join(root, "conf/base")
    os.makedirs(conf, exist_ok=True)
    with open(os.path.join(conf, "parameters.yml"), "w") as f:
        yaml.safe_dump(params, f)
    return ids


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    keep = "--keep" in sys.argv
    root = args[0] if args else tempfile.mkdtemp(prefix="mmc_demo_")
    print(f"project root: {root}")
    ids = fabricate(root)

    from multimodal_classification_tpu.cli import main as cli

    # validate/inference need --variant lmdb: like the reference, the bare
    # names default to the resnet feature source (SURVEY.md §3.5), which is
    # the wrong store for an lmdb-trained checkpoint
    for argv in (["run", "--pipeline=vilbert_lmdb_train"],
                 ["run", "--pipeline=vilbert_validate", "--variant", "lmdb"],
                 ["run", "--pipeline=vilbert_inference_local", "--variant", "lmdb"]):
        print(f"\n=== mmc-tpu {' '.join(argv)} ===")
        rc = cli(argv + ["--root", root])
        assert rc == 0, argv
    cli(["plots", "--root", root])

    arts = {
        "test_metrics": "data/08_reporting/test_metrics.json",
        "validation_metrics": "data/08_reporting/validation_metrics.json",
        "training_history": "data/08_reporting/training_history.json",
        "predictions": "data/07_model_output/predictions.csv",
        "plots": "plots",
    }
    print("\n=== artifacts ===")
    for name, rel in arts.items():
        path = os.path.join(root, rel)
        ok = os.path.exists(path)
        print(f"{name:20s} {'OK ' if ok else 'MISSING '} {path}")
        assert ok, path
    tm = json.load(open(os.path.join(root, arts["test_metrics"])))
    print(f"\ntest AUROC = {tm['auroc']:.4f} (signal-injected fixture; expect > 0.9)")
    assert tm["auroc"] > 0.9

    # one online prediction through the serving stack (in-process)
    from multimodal_classification_tpu.config import (
        experiment_from_parameters,
        load_parameters,
    )
    from multimodal_classification_tpu.data import load_tokenizer
    from multimodal_classification_tpu.pipelines.base import (
        build_model_and_params,
        make_feature_store,
    )
    from multimodal_classification_tpu.serving import ServingModel
    from multimodal_classification_tpu.training.train import Trainer

    params = load_parameters(os.path.join(root, "conf/base/parameters.yml"))
    ex = experiment_from_parameters(params, "lmdb")
    model, tree = build_model_and_params(ex, root)
    trainer = Trainer(model, ex, checkpoint_dir=os.path.join(root, ex.output_dir))
    tree = trainer.ckpt.restore("best")["params"]
    store = make_feature_store("lmdb", ex, root)
    sm = ServingModel(
        model, tree, load_tokenizer(os.path.join(root, "vocab.txt"), True), store,
        max_seq_length=ex.data.max_seq_length, num_regions=store.num_regions,
        feature_dim=store.feature_dim, batch_size=4)
    probs = sm.predict(["a hateful meme"], [{"id": str(ids[0])}])
    print(f"serving P(hateful) for id {ids[0]}: {float(probs[0, 1]):.4f}")

    # export the trained model as a portable artifact and predict from it
    # (no model code on the loading side): must agree with the live server
    rc = cli(["export", "--variant", "lmdb", "--root", root,
              "--out", os.path.join(root, "artifact"), "--batch-size", "4"])
    assert rc == 0, "export failed"
    from multimodal_classification_tpu.serving import load_artifact

    loaded = load_artifact(os.path.join(root, "artifact"),
                           load_tokenizer(os.path.join(root, "vocab.txt"), True),
                           store)
    probs2 = loaded.predict(["a hateful meme"], [{"id": str(ids[0])}])
    np.testing.assert_allclose(probs2, probs, rtol=1e-5, atol=1e-6)
    print(f"exported-artifact P(hateful) matches: {float(probs2[0, 1]):.4f}")

    if not args and not keep:
        shutil.rmtree(root, ignore_errors=True)
        print("(workdir removed; pass a path or --keep to retain)")
    print("\nDEMO OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
