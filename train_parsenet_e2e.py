"""End-to-end fine-tuning with the fitting loss (reference: train_parsenet_e2e.py).

Usage: python train_parsenet_e2e.py configs/config_parsenet_e2e.yml
"""
import sys

from parsenet_tpu.core.config import load_config
from parsenet_tpu.core.logging import setup_logging, snapshot_config
from parsenet_tpu.train.train_e2e import run_training

if __name__ == "__main__":
    cfg = load_config(sys.argv[1] if len(sys.argv) > 1 else None)
    setup_logging(cfg.log_dir, "parsenet_e2e")
    snapshot_config(cfg, cfg.log_dir, "parsenet_e2e")
    run_training(cfg)
