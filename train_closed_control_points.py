"""Train the closed-spline SplineNet (reference: train_closed_control_points.py).

Usage: python train_closed_control_points.py configs/config_closed_splines.yml
"""
import sys

from parsenet_tpu.core.config import load_config
from parsenet_tpu.core.logging import setup_logging, snapshot_config
from parsenet_tpu.train.train_spline import run_training

if __name__ == "__main__":
    cfg = load_config(sys.argv[1] if len(sys.argv) > 1 else None)
    setup_logging(cfg.log_dir, "closed_splines")
    snapshot_config(cfg, cfg.log_dir, "closed_splines")
    run_training(cfg, closed=True)
