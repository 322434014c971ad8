"""Run the full reference training workflow on the chip (round-1 recipe).

Stages (each an isolated subprocess so a failure doesn't kill the rest and
compile caches stay clean):
  1. synthetic data generation (if data/ is missing)
  2. open SplineNet pretrain          (reference: train_open_splines.py)
  3. closed SplineNet pretrain        (reference: train_closed_control_points.py)
  4. segmentation pretrain, 40 epochs (reference: train_parsenet.py, mode 5)
  5. e2e fine-tune, 1800 steps        (reference: train_parsenet_e2e.py)

Checkpoints land under logs/checkpoints/{open,closed}_splinenet,
parsenet_seg_normals, parsenet_e2e. Run generate_predictions.py + test.py
afterwards for the quality table.

Usage: python scripts/train_workflow.py [stage ...]   (default: all)
WORKFLOW_BF16=1 trains seg/e2e with half_precision (bf16 network compute,
f32 params/statistics — core/config.py:85); quality vs f32 is part of the
round-3 capstone A/B (RESULTS.md).
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAGES = ("data", "open", "closed", "seg", "e2e")
BF16 = ", half_precision=True" if os.environ.get("WORKFLOW_BF16") == "1" \
    else ""


def run_stage(name: str) -> None:
    t0 = time.time()
    print(f"=== stage {name} start", flush=True)
    code = {
        "data": (
            "import subprocess, sys;"
            "subprocess.check_call([sys.executable,"
            " 'scripts/make_synthetic_data.py', '--shapes', '960',"
            " '--splines', '512'])"
        ),
        "open": (
            "from parsenet_tpu.core.config import load_config;"
            "from parsenet_tpu.train.train_spline import run_training;"
            "cfg = load_config('configs/config_open_splines.yml',"
            " num_train=440, num_val=36, num_test=36, num_epochs=20);"
            "run_training(cfg, closed=False)"
        ),
        "closed": (
            "from parsenet_tpu.core.config import load_config;"
            "from parsenet_tpu.train.train_spline import run_training;"
            "cfg = load_config('configs/config_closed_splines.yml',"
            " num_train=440, num_val=36, num_test=36, num_epochs=20);"
            "run_training(cfg, closed=True)"
        ),
        "seg": (
            "from parsenet_tpu.core.config import load_config;"
            "from parsenet_tpu.train.train_seg import run_training;"
            "cfg = load_config('configs/config_parsenet_normals.yml',"
            " num_train=960, num_val=160, num_test=160, num_epochs=40,"
            f" batch_size=1{BF16});"
            # batch 1 x accum 6 computes the IDENTICAL 6-shape averaged
            # gradient as round-1's batch 2 x accum 3 (GroupNorm and the
            # triplet loss are per-shape; the only cross-shape coupling is
            # the batch mean) but runs 20.9 vs 19.1 shapes/s on v5e
            "run_training(cfg, num_accum=6)"
        ),
        "e2e": (
            "from parsenet_tpu.core.config import load_config;"
            "from parsenet_tpu.train.train_e2e import run_training;"
            "cfg = load_config('configs/config_parsenet_e2e.yml',"
            f" num_train=180, num_val=160, num_test=160, num_epochs=10{BF16});"
            "run_training(cfg)"
        ),
    }[name]
    if name == "data" and os.path.exists(
            os.path.join(REPO, "data/shapes/train_data.h5")):
        print("=== stage data skipped (data/ exists)", flush=True)
        return
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
    subprocess.check_call(
        [sys.executable, "-c",
         "import jax, os;"
         "jax.config.update('jax_compilation_cache_dir',"
         " os.environ['JAX_COMPILATION_CACHE_DIR']);"
         "jax.config.update('jax_persistent_cache_min_compile_time_secs',"
         " 1.0);"
         "import logging; logging.basicConfig(level=logging.INFO);"
         + code],
        cwd=REPO, env=env)
    print(f"=== stage {name} done in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    wanted = sys.argv[1:] or list(STAGES)
    for s in wanted:
        if s not in STAGES:
            raise SystemExit(f"unknown stage {s}; choose from {STAGES}")
        run_stage(s)
    print("=== workflow complete", flush=True)
