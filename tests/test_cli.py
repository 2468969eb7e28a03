"""CLI smoke tests (the reference's tests/test_run.py KedroSession smoke,
SURVEY.md §4 — but actually runnable: fabricated data, tiny model)."""

import json
import os

import pytest

from multimodal_classification_tpu.cli import main
from tests.fixtures import make_dataset_dir


def test_list_commands(capsys):
    assert main(["list", "pipelines"]) == 0
    out = capsys.readouterr().out
    assert "vilbert_lmdb_train" in out
    assert main(["list", "extractors"]) == 0
    assert "dinov2" in capsys.readouterr().out
    assert main(["list", "models"]) == 0
    assert "vilbert_facebook" in capsys.readouterr().out


def test_run_data_processing_pipeline(tmp_path, capsys):
    root = tmp_path
    data_dir = root / "data/01_raw/hateful_memes"
    data_dir.mkdir(parents=True)
    make_dataset_dir(data_dir, n_train=16, n_val=8, n_test=8)
    conf = root / "conf/base"
    conf.mkdir(parents=True)
    with open(conf / "parameters.yml", "w") as f:
        f.write("data_processing:\n  data_dir: data/01_raw/hateful_memes\n")
    assert main(["run", "--pipeline=data_processing", "--root", str(root)]) == 0
    stats = json.load(open(root / "data/08_reporting/data_splits_info.json"))
    assert stats["train"]["num_samples"] == 16


def test_calibration_examples_from_val_split(tmp_path):
    """serve/export --calibrate N pulls texts+ids from the val split."""
    from multimodal_classification_tpu.cli import _calibration_examples

    root = tmp_path
    data_dir = root / "data/01_raw/hateful_memes"
    data_dir.mkdir(parents=True)
    make_dataset_dir(data_dir, n_train=16, n_val=8, n_test=8)
    texts, insts = _calibration_examples(
        {"data_processing": {"data_dir": "data/01_raw/hateful_memes"}},
        str(root), 5)
    assert len(texts) == 5 and len(insts) == 5
    assert all(isinstance(t, str) and t for t in texts)
    assert all(set(i) == {"id"} for i in insts)


def test_unknown_pipeline_errors(tmp_path):
    with pytest.raises(KeyError, match="Unknown pipeline"):
        main(["run", "--pipeline=nope", "--root", str(tmp_path)])


def test_resume_flag_rejected_for_non_training_pipeline(tmp_path):
    with pytest.raises(SystemExit):
        main(["run", "--pipeline=vilbert_inference", "--resume",
              "--root", str(tmp_path)])


def test_variant_flag_rebinds_pipeline(tmp_path, monkeypatch):
    from functools import partial

    from multimodal_classification_tpu.registry import PIPELINE_REGISTRY

    seen = {}

    def fake_pipeline(variant, params, root=".", tracker=None):
        seen["variant"] = variant
        return {}

    monkeypatch.setitem(PIPELINE_REGISTRY, "fake_validate",
                        partial(fake_pipeline, ""))
    (tmp_path / "conf/base").mkdir(parents=True)
    (tmp_path / "conf/base/parameters.yml").write_text("{}")
    assert main(["run", "--pipeline=fake_validate", "--variant", "lmdb",
                 "--root", str(tmp_path)]) == 0
    assert seen["variant"] == "lmdb"


def test_params_inline_overrides(tmp_path, monkeypatch):
    """--params accepts dotted.key=value overrides (kedro --params parity),
    mixed with YAML paths; values YAML-parse to their natural types."""
    from multimodal_classification_tpu.registry import PIPELINE_REGISTRY

    seen = {}

    def fake_pipeline(params, root=".", tracker=None):
        seen.update(params)
        return {}

    monkeypatch.setitem(PIPELINE_REGISTRY, "fake_override", fake_pipeline)
    (tmp_path / "conf/base").mkdir(parents=True)
    (tmp_path / "conf/base/parameters.yml").write_text(
        "training:\n  learning_rate: 1.0e-5\n  batch_size: 16\n")
    assert main([
        "run", "--pipeline=fake_override", "--root", str(tmp_path),
        "--params", str(tmp_path / "conf/base/parameters.yml"),
        "training.learning_rate=3e-5", "vilbert.freeze_bert_layers=6",
    ]) == 0
    assert seen["training"]["learning_rate"] == pytest.approx(3e-5)
    assert seen["training"]["batch_size"] == 16  # YAML value preserved
    assert seen["vilbert"]["freeze_bert_layers"] == 6  # created path


def test_apply_param_overrides_types_and_errors():
    from multimodal_classification_tpu.config import apply_param_overrides

    p = apply_param_overrides({}, ["a.b=true", "a.c=null", "d=text", "e=1.5"])
    assert p == {"a": {"b": True, "c": None}, "d": "text", "e": 1.5}
    with pytest.raises(ValueError, match="dotted.key=value"):
        apply_param_overrides({}, ["novalue"])


def test_variant_flag_rejected_for_non_partial(tmp_path, monkeypatch):
    from multimodal_classification_tpu.registry import PIPELINE_REGISTRY

    monkeypatch.setitem(PIPELINE_REGISTRY, "fake_plain", lambda params, root=".": {})
    with pytest.raises(SystemExit):
        main(["run", "--pipeline=fake_plain", "--variant", "x",
              "--root", str(tmp_path)])


def test_doctor_is_hang_proof_and_reports(capsys):
    """mmc-tpu doctor must return even when the accelerator backend is
    unreachable (probe is time-boxed) and must report the CPU fallback +
    native components. timeout=0.01 forces the accelerator probe down the
    timeout path without waiting on the real relay."""
    from multimodal_classification_tpu.utils.doctor import run_doctor

    checks = run_doctor(timeout=0.01)
    by_name = {n: (s, d) for n, s, d in checks}
    assert by_name["default backend (accelerator)"][0] == "fail"
    assert "no response" in by_name["default backend (accelerator)"][1]
    # CPU probe uses min(timeout, 120) — with timeout=0.01 it also times out,
    # so re-run the CPU check alone with a sane budget
    from multimodal_classification_tpu.utils.doctor import _probe_backend

    status, detail = _probe_backend(120.0, force_cpu=True)
    assert status == "ok" and "cpu" in detail
    # the probe now proves COMPUTE works, not just enumeration
    assert "trivial op" in detail
    assert by_name["flax"][0] == "ok"
    assert by_name["native LMDB reader"][0] in ("ok", "warn")


def test_doctor_distinguishes_stalled_relay_from_down_relay(monkeypatch):
    """Field failure mode (measured round 3): jax.devices() answers in
    milliseconds while the first executable load hangs for minutes. A
    devices-only probe reports 'ok' for a backend that cannot run one op;
    the two-phase probe must call this out as a stall, not success."""
    from multimodal_classification_tpu.utils import doctor

    fake = (
        "import json, time\n"
        "print(json.dumps({'platform': 'axon', 'kind': 'TPU v5 lite',"
        " 'n': 1}), flush=True)\n"
        "time.sleep(60)\n"
    )
    monkeypatch.setattr(doctor, "_PROBE", fake)
    # 15 s: the child must have time to START (interpreter startup takes
    # seconds on this 1-core host when the suite runs in parallel)
    status, detail = doctor._probe_backend(15.0, force_cpu=False)
    assert status == "fail"
    assert "stalled" in detail and "axon" in detail
