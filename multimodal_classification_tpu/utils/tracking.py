"""Experiment tracking with an MLflow-file-store-compatible layout.

The reference logs params/metrics to MLflow's local file store and post-hoc
tooling parses the raw ``mlruns/`` metric files directly
(reference: nodes.py:763-772,811-819,940-947; generate_plots.py:45-59 reads
``mlruns/<exp>/<run>/metrics/<key>`` lines of ``<ts_ms> <value> <step>``).
The ``mlflow`` package is not a dependency here; this writes the same on-disk
format (readable by ``mlflow ui`` and by our plots tool) in ~100 lines.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Any, Mapping, Optional

import yaml


def _now_ms() -> int:
    return int(time.time() * 1000)


class Tracker:
    """File-store experiment tracker (mlruns layout)."""

    def __init__(self, root: str = "mlruns", experiment: str = "Default"):
        self.root = root
        self.experiment = experiment
        self.exp_id = self._ensure_experiment(experiment)
        self.run_id: Optional[str] = None
        self.run_dir: Optional[str] = None

    # -- experiment / run lifecycle -------------------------------------
    def _ensure_experiment(self, name: str) -> str:
        os.makedirs(self.root, exist_ok=True)
        for exp_id in os.listdir(self.root):
            meta = os.path.join(self.root, exp_id, "meta.yaml")
            if os.path.exists(meta):
                with open(meta) as f:
                    if (yaml.safe_load(f) or {}).get("name") == name:
                        return exp_id
        exp_id = "0" if name == "Default" else uuid.uuid4().hex[:12]
        exp_dir = os.path.join(self.root, exp_id)
        os.makedirs(exp_dir, exist_ok=True)
        with open(os.path.join(exp_dir, "meta.yaml"), "w") as f:
            yaml.safe_dump(
                {
                    "artifact_location": os.path.abspath(exp_dir),
                    "experiment_id": exp_id,
                    "lifecycle_stage": "active",
                    "name": name,
                },
                f,
            )
        return exp_id

    def start_run(self, run_name: Optional[str] = None) -> str:
        self.run_id = uuid.uuid4().hex
        self.run_dir = os.path.join(self.root, self.exp_id, self.run_id)
        for sub in ("metrics", "params", "tags", "artifacts"):
            os.makedirs(os.path.join(self.run_dir, sub), exist_ok=True)
        meta = {
            "artifact_uri": os.path.join(os.path.abspath(self.run_dir), "artifacts"),
            "end_time": None,
            "experiment_id": self.exp_id,
            "lifecycle_stage": "active",
            "run_id": self.run_id,
            "run_uuid": self.run_id,
            "run_name": run_name or self.run_id[:8],
            "source_type": 4,
            "start_time": _now_ms(),
            "status": 1,  # RUNNING
            "user_id": os.environ.get("USER", "unknown"),
        }
        with open(os.path.join(self.run_dir, "meta.yaml"), "w") as f:
            yaml.safe_dump(meta, f)
        if run_name:
            self.set_tag("mlflow.runName", run_name)
        return self.run_id

    def end_run(self, status: str = "FINISHED"):
        if not self.run_dir:
            return
        meta_path = os.path.join(self.run_dir, "meta.yaml")
        with open(meta_path) as f:
            meta = yaml.safe_load(f)
        meta["end_time"] = _now_ms()
        meta["status"] = 3 if status == "FINISHED" else 4
        with open(meta_path, "w") as f:
            yaml.safe_dump(meta, f)
        self.run_id = self.run_dir = None

    # -- logging ---------------------------------------------------------
    def _require_run(self):
        if self.run_dir is None:
            self.start_run()

    def log_params(self, params: Mapping[str, Any]):
        self._require_run()
        for k, v in params.items():
            with open(os.path.join(self.run_dir, "params", str(k)), "w") as f:
                f.write(str(v))

    def log_metrics(self, metrics: Mapping[str, float], step: int = 0):
        self._require_run()
        ts = _now_ms()
        for k, v in metrics.items():
            with open(os.path.join(self.run_dir, "metrics", str(k)), "a") as f:
                f.write(f"{ts} {float(v)} {int(step)}\n")

    def log_metric(self, key: str, value: float, step: int = 0):
        self.log_metrics({key: value}, step)

    def set_tag(self, key: str, value: str):
        self._require_run()
        with open(os.path.join(self.run_dir, "tags", key), "w") as f:
            f.write(str(value))

    # -- reading (for plots / analysis) ----------------------------------
    @staticmethod
    def read_metric(run_dir: str, key: str):
        """[(timestamp_ms, value, step)] — format parsed by generate_plots."""
        path = os.path.join(run_dir, "metrics", key)
        out = []
        with open(path) as f:
            for line in f:
                ts, val, step = line.split()
                out.append((int(ts), float(val), int(step)))
        return out


class NullTracker(Tracker):
    """No-op tracker for tests/benchmarks."""

    def __init__(self):  # noqa: super not called on purpose
        self.run_id = None
        self.run_dir = None

    def start_run(self, run_name=None):
        return "null"

    def end_run(self, status="FINISHED"):
        pass

    def log_params(self, params):
        pass

    def log_metrics(self, metrics, step=0):
        pass

    def set_tag(self, key, value):
        pass
