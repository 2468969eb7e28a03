"""Publication figures from the mlruns file store.

Equivalent of the reference's generate_plots.py (parses raw
``mlruns/<exp>/<run>/metrics/*`` files, picks the best run per model by final
AUROC, renders comparison / training-curve figures — generate_plots.py:45-77).
Works on both our Tracker's output and real MLflow file stores (same format).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple


def _read_metric(run_dir: str, key: str) -> List[Tuple[int, float, int]]:
    path = os.path.join(run_dir, "metrics", key)
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 3:
                out.append((int(parts[0]), float(parts[1]), int(parts[2])))
    return out


def _run_name(run_dir: str) -> str:
    tag = os.path.join(run_dir, "tags", "mlflow.runName")
    if os.path.exists(tag):
        return open(tag).read().strip()
    return os.path.basename(run_dir)[:8]


def collect_runs(mlruns_root: str = "mlruns") -> List[Dict]:
    """All runs with their final/best val AUROC and histories."""
    runs = []
    if not os.path.isdir(mlruns_root):
        return runs
    for exp in os.listdir(mlruns_root):
        exp_dir = os.path.join(mlruns_root, exp)
        if not os.path.isdir(exp_dir):
            continue
        for run in os.listdir(exp_dir):
            run_dir = os.path.join(exp_dir, run)
            if not os.path.isdir(run_dir) or not os.path.isdir(
                os.path.join(run_dir, "metrics")
            ):
                continue
            auroc = _read_metric(run_dir, "val_auroc")
            if not auroc:
                continue
            runs.append(
                {
                    "run_dir": run_dir,
                    "name": _run_name(run_dir),
                    "val_auroc": [v for _t, v, _s in auroc],
                    "train_loss": [v for _t, v, _s in _read_metric(run_dir, "train_loss")],
                    "val_loss": [v for _t, v, _s in _read_metric(run_dir, "val_loss")],
                    "final_auroc": auroc[-1][1],
                    "best_auroc": max(v for _t, v, _s in auroc),
                }
            )
    return runs


def best_run_per_model(runs: List[Dict]) -> Dict[str, Dict]:
    """Best run per run-name by final AUROC (generate_plots.py:77)."""
    best: Dict[str, Dict] = {}
    for r in runs:
        if r["name"] not in best or r["final_auroc"] > best[r["name"]]["final_auroc"]:
            best[r["name"]] = r
    return best


def generate_plots(mlruns_root: str = "mlruns", out_dir: str = "plots") -> List[str]:
    """Render model-comparison bar chart + training curves → ``plots/``."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    runs = collect_runs(mlruns_root)
    if not runs:
        return []
    os.makedirs(out_dir, exist_ok=True)
    best = best_run_per_model(runs)
    written = []

    # comparison bar chart
    names = sorted(best, key=lambda n: -best[n]["best_auroc"])
    fig, ax = plt.subplots(figsize=(max(6, len(names) * 1.1), 4))
    ax.bar(range(len(names)), [best[n]["best_auroc"] for n in names])
    ax.axhline(0.7045, ls="--", c="gray", label="Facebook baseline 0.7045")
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation=30, ha="right")
    ax.set_ylabel("val AUROC")
    ax.set_title("Model comparison (best run per pipeline)")
    ax.legend()
    fig.tight_layout()
    p = os.path.join(out_dir, "model_comparison.png")
    fig.savefig(p, dpi=120)
    plt.close(fig)
    written.append(p)

    # training curves
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    for n in names:
        r = best[n]
        axes[0].plot(r["val_auroc"], label=n)
        if r["train_loss"]:
            axes[1].plot(r["train_loss"], label=n)
    axes[0].set_title("val AUROC by epoch")
    axes[1].set_title("train loss by epoch")
    for ax in axes:
        ax.set_xlabel("epoch")
        ax.legend(fontsize=7)
    fig.tight_layout()
    p = os.path.join(out_dir, "training_curves.png")
    fig.savefig(p, dpi=120)
    plt.close(fig)
    written.append(p)

    # train/val loss, top-2 models (reference: plot_training_loss_separate,
    # generate_plots.py:234 — solid=train, dashed=val, one color per model)
    fig, ax = plt.subplots(figsize=(8, 5))
    for i, n in enumerate(names[:2]):
        r = best[n]
        color = f"C{i}"
        if r["train_loss"]:
            ax.plot(r["train_loss"], color=color, ls="-", label=f"{n} (train)")
        if r["val_loss"]:
            ax.plot(r["val_loss"], color=color, ls="--", label=f"{n} (val)")
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.set_title("Training and validation loss (top 2 models)")
    ax.legend()
    fig.tight_layout()
    p = os.path.join(out_dir, "training_loss.png")
    fig.savefig(p, dpi=120)
    plt.close(fig)
    written.append(p)

    # ablation comparison: base pipeline vs its ablation variants
    # (reference hard-codes its freeze/tuning results, generate_plots.py:341,
    # :419; here the same figure derives from the mlruns data)
    suffixes = ("_freeze6", "_focal", "_b32")
    groups: Dict[str, Dict[str, float]] = {}
    for n in names:
        base = n
        label = "base"
        for s in suffixes:
            if n.endswith(s):
                base, label = n[: -len(s)], s[1:]
                break
        groups.setdefault(base, {})[label] = best[n]["best_auroc"]
    groups = {b: v for b, v in groups.items() if len(v) > 1}
    if groups:
        labels = ["base"] + [s[1:] for s in suffixes]
        bases = sorted(groups)
        width = 0.8 / len(labels)
        fig, ax = plt.subplots(figsize=(max(6, len(bases) * 1.6), 4.5))
        for j, lab in enumerate(labels):
            xs = [i + (j - len(labels) / 2) * width for i in range(len(bases))]
            ys = [groups[b].get(lab) for b in bases]
            ax.bar([x for x, y in zip(xs, ys) if y is not None],
                   [y for y in ys if y is not None], width, label=lab)
        ax.set_xticks(range(len(bases)))
        ax.set_xticklabels(bases, rotation=20, ha="right")
        ax.set_ylabel("best val AUROC")
        ax.set_title("Ablation comparison (freeze-6 / focal / batch-32)")
        ax.legend()
        fig.tight_layout()
        p = os.path.join(out_dir, "ablation_comparison.png")
        fig.savefig(p, dpi=120)
        plt.close(fig)
        written.append(p)
    return written


if __name__ == "__main__":
    import sys

    out = generate_plots(*(sys.argv[1:3]))
    print("\n".join(out) if out else "no runs found")
