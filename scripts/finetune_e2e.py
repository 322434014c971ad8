"""Continuation fine-tune of the SHIPPED e2e checkpoint, gated for shipping.

Round-3 post-mortem (RESULTS.md): the from-scratch round-3 retrain missed
the sk_2 floor by 0.001 on the 10k bench protocol, partly because epoch
selection scored a reduced-scale val sample. This script implements the
NEXT.md follow-up: continue fine-tuning FROM the shipped params/ export at
a reduced lr, selecting the best epoch on a fixed 24-shape val sample at
the SAME 10k-point scale the shipping gate measures (train_e2e.run_training
val_points=10000).

Crash-safety: checkpoints go to logs/checkpoints/parsenet_e2e_ft — a name
bench.py does NOT restore — so a half-finished run can never leak into the
driver's end-of-round bench. Promotion path (manual, per the RESULTS.md
shipping rule):
  1. python scripts/finetune_e2e.py --epochs 6
  2. python scripts/export_params.py --e2e-ckpt parsenet_e2e_ft \
         --e2e-out /tmp/cand_e2e.npz
  3. BENCH_PARAMS=/tmp/cand_e2e.npz python bench.py   # the 10k gate
  4. green AND >= shipped metrics -> cp /tmp/cand_e2e.npz params/parsenet_e2e.npz

Usage: python scripts/finetune_e2e.py [--epochs 6] [--lr 5e-5]
       [--val-points 10000] [--val-shapes 24]
"""
import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--lr", type=float, default=5e-5,
                    help="half the from-scratch e2e lr: this is a "
                         "continuation of an already-converged checkpoint")
    ap.add_argument("--val-points", type=int, default=10000)
    ap.add_argument("--val-shapes", type=int, default=24)
    ap.add_argument("--fast-step", action="store_true",
                    help="train with the Config.fast_step knob bundle "
                         "(FAST_STEP_KNOBS) — the round-5 quality gate for "
                         "the fast e2e train step: a short continuation "
                         "trained this way must stay floors-green")
    ap.add_argument("--model-path", default="parsenet_e2e_ft",
                    help="checkpoint name under logs/checkpoints/ (never "
                         "a name bench.py restores)")
    args = ap.parse_args()

    from parsenet_tpu.core.checkpoint import load_npz_params
    from parsenet_tpu.core.config import load_config
    from parsenet_tpu.core.logging import setup_logging, snapshot_config
    from parsenet_tpu.train.train_e2e import run_training

    cfg = load_config(os.path.join(REPO, "configs/config_parsenet_e2e.yml"),
                      num_train=180, num_val=160, num_test=160,
                      num_epochs=args.epochs, lr=args.lr,
                      model_path=args.model_path,
                      fast_step=args.fast_step,
                      pretrain_model_path="")
    setup_logging(cfg.log_dir, args.model_path)
    snapshot_config(cfg, cfg.log_dir, args.model_path)
    npz = load_npz_params(os.path.join(REPO, "params", "parsenet_e2e.npz"))
    if npz is None:
        raise SystemExit("params/parsenet_e2e.npz missing — nothing to "
                         "continue from")
    run_training(cfg, pretrained_params=npz["params"],
                 val_shapes=args.val_shapes, val_points=args.val_points)


if __name__ == "__main__":
    main()
