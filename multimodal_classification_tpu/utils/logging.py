"""Logging setup: console + rotating file handler.

Mirrors the reference's conf/logging.yml (rich console + rotating
``info.log`` 10MB × 20 backups, project loggers at INFO)."""

from __future__ import annotations

import logging
import logging.handlers
import os
from typing import Optional


def setup_logging(
    log_dir: Optional[str] = "logs",
    level: int = logging.INFO,
    filename: str = "info.log",
) -> None:
    root = logging.getLogger()
    root.setLevel(level)
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")

    if not any(isinstance(h, logging.StreamHandler) for h in root.handlers):
        console = logging.StreamHandler()
        console.setFormatter(fmt)
        root.addHandler(console)

    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.join(log_dir, filename)
        if not any(
            isinstance(h, logging.handlers.RotatingFileHandler)
            and getattr(h, "baseFilename", None) == os.path.abspath(path)
            for h in root.handlers
        ):
            fh = logging.handlers.RotatingFileHandler(
                path, maxBytes=10 * 1024 * 1024, backupCount=20
            )
            fh.setFormatter(fmt)
            root.addHandler(fh)

    # quiet noisy third-party loggers
    for noisy in ("jax._src", "absl", "h5py"):
        logging.getLogger(noisy).setLevel(logging.WARNING)
