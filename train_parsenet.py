"""Train the ParSeNet segmentation network (reference: train_parsenet.py).

Usage: python train_parsenet.py configs/config_parsenet.yml
"""
import sys

from parsenet_tpu.core.config import load_config
from parsenet_tpu.core.logging import setup_logging, snapshot_config
from parsenet_tpu.train.train_seg import run_training

if __name__ == "__main__":
    cfg = load_config(sys.argv[1] if len(sys.argv) > 1 else None)
    setup_logging(cfg.log_dir, "parsenet")
    snapshot_config(cfg, cfg.log_dir, "parsenet")
    run_training(cfg)
