"""Metrics logging / observability.

Equivalent of the reference's tensorboard_logger + python logging + config
snapshot provenance (train_parsenet.py:37-60, 209-214). Writes:
  * scalar curves as TensorBoard event files when tensorboard is available
    (it is in the reference env), else no-op,
  * an append-only metrics.jsonl (always), cheap to parse for benches,
  * the config snapshot JSON.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict


def setup_logging(log_dir: str, name: str) -> logging.Logger:
    """stdout + per-run logfile (reference: train_parsenet.py:41-50)."""
    os.makedirs(f"{log_dir}/logs", exist_ok=True)
    logger = logging.getLogger("parsenet_tpu")
    logger.setLevel(logging.INFO)
    logger.propagate = False  # avoid duplicate lines via the root logger
    if not logger.handlers:
        fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        fh = logging.FileHandler(f"{log_dir}/logs/{name}.log")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class MetricsLogger:
    def __init__(self, log_dir: str, name: str):
        self.dir = os.path.join(log_dir, "tensorboard", name)
        os.makedirs(self.dir, exist_ok=True)
        self.jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._tb = None
        try:  # tensorboardX / torch writers may or may not exist
            from torch.utils.tensorboard import SummaryWriter  # type: ignore
            self._tb = SummaryWriter(self.dir)
        except Exception:
            self._tb = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": step, "time": time.time(), **metrics}
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        self.jsonl.close()
        if self._tb is not None:
            self._tb.close()


def snapshot_config(config, log_dir: str, name: str) -> None:
    """(reference: train_parsenet.py:52-60)."""
    os.makedirs(f"{log_dir}/configs", exist_ok=True)
    config.write(f"{log_dir}/configs/{name}.json")
