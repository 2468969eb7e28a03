"""Runbook preflight (scripts/reproduce_lmdb_auroc.py --preflight-only).

Drives the real-data runbook's stage-0 artifact validation end-to-end
against the fabricated dry-run project: LMDB bytes through the native
reader, the upstream-layout torch checkpoint through the converter with
full key coverage, and the golden forward against the reference torch
implementation loaded with the SAME checkpoint.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dry_run_preflight_passes(tmp_path):
    env = dict(os.environ, MMC_PLATFORM="cpu")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/reproduce_lmdb_auroc.py"),
         "--dry-run", "--preflight-only", "--root", str(tmp_path / "proj")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-3000:]
    assert "preflight A PASS" in out
    assert "preflight B PASS" in out
    assert "preflight C PASS" in out


def test_preflight_fails_on_corrupt_checkpoint(tmp_path):
    """A checkpoint with missing/foreign keys must fail stage B (coverage),
    not crash — the gate's job is a clear verdict before hours of training."""
    import numpy as np
    import torch

    sys.path.insert(0, REPO)
    from multimodal_classification_tpu.data.lmdb_store import write_feature_lmdb

    spec = __import__("importlib.util", fromlist=["spec_from_file_location"])
    s = spec.spec_from_file_location(
        "repro", os.path.join(REPO, "scripts/reproduce_lmdb_auroc.py"))
    mod = spec.module_from_spec(s)
    s.loader.exec_module(mod)

    from multimodal_classification_tpu.config import tiny_vilbert_config

    cfg = tiny_vilbert_config(dtype="float32", use_pallas_attention=False,
                              v_feature_size=64)
    rng = np.random.default_rng(0)
    lmdb_path = str(tmp_path / "detectron.lmdb")
    write_feature_lmdb(lmdb_path, ["100", "200"],
                       rng.standard_normal((2, 6, 64)).astype(np.float32),
                       rng.uniform(0, 900, (2, 6, 4)).astype(np.float32))
    bad = {"totally.wrong.key": torch.zeros(3)}
    ckpt = str(tmp_path / "bad.bin")
    torch.save(bad, ckpt)
    assert mod.preflight(lmdb_path, ckpt, cfg) is False
