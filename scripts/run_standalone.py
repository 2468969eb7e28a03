#!/usr/bin/env python
"""Standalone trainer — no CLI/pipeline registry, reads parameters.yml
directly (the reference's escape hatch run_resnet152_roi.py, which mocks out
Kedro entirely). Defaults to the resnet152_roi variant like the reference.

Usage: python scripts/run_standalone.py [variant] [--root .]
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", nargs="?", default="resnet152_roi")
    ap.add_argument("--root", default=".")
    args = ap.parse_args()

    from multimodal_classification_tpu.config import (
        default_parameter_paths,
        load_parameters,
    )
    from multimodal_classification_tpu.pipelines.base import run_training_pipeline
    from multimodal_classification_tpu.utils.logging import setup_logging
    from multimodal_classification_tpu.utils.tracking import Tracker

    setup_logging()
    params = load_parameters(*default_parameter_paths(args.root))
    tracker = Tracker(root=f"{args.root}/mlruns", experiment="standalone")
    result = run_training_pipeline(args.variant, params, args.root, tracker)
    print({k: v for k, v in result.get("test_metrics", {}).items()
           if isinstance(v, (int, float))})
    return 0


if __name__ == "__main__":
    sys.exit(main())
