"""Evaluate the closed-spline SplineNet (reference: test_closed_control_points.py).

Usage: python test_closed_control_points.py configs/config_closed_splines.yml [--optimize] [--export DIR]
"""
import sys

from parsenet_tpu.core.config import load_config
from parsenet_tpu.core.logging import setup_logging
from parsenet_tpu.eval.splines import evaluate_splinenet

if __name__ == "__main__":
    cfg = load_config(sys.argv[1] if len(sys.argv) > 1 else None)
    setup_logging(cfg.log_dir, "test_closed_control_points")
    evaluate_splinenet(cfg, closed=True,
                       if_optimize="--optimize" in sys.argv,
                       export_dir=(sys.argv[sys.argv.index("--export") + 1]
                                   if "--export" in sys.argv else None))
