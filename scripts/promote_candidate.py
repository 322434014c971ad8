"""Two-stream shipping gate for params/ candidates (VERDICT round-3 task 5).

Round 3 promoted twice in a row by selecting on ONE deterministic 32-shape
stream (seed 7) with floors riding a 0.01 margin — repeated
select-on-the-gate rounds risk overfitting params/ to that stream. The
promotion rule is now:

  1. PRIMARY (stream a, the historical gate): bench quality floors GREEN
     and seg_iou >= the shipped headline;
  2. SECONDARY (stream b, disjoint seed): seg_iou and sk_2 within the
     documented noise band (default 0.02, NEXT.md's measured per-slice
     variance) of the SHIPPED params measured on the same stream b.

Only when both hold is the candidate npz copied into params/. All four
measurements are real `bench.py` runs at the full 10k protocol
(BENCH_PARAMS=<npz> [BENCH_STREAM=b]).

Usage:
  python scripts/promote_candidate.py \
      --cand logs/cand.npz --gate-a logs/cand_a.json \
      --gate-b logs/cand_b.json --shipped-b logs/shipped_b.json \
      --shipped-a-json BENCH_r03.json \
      [--noise 0.02] [--dest params/parsenet_e2e.npz]

Exit 0 = promoted (file copied); exit 1 = gate failed (params/ untouched);
exit 2 = inputs missing/unparseable.
"""
import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_detail(path):
    """Accept either a raw bench.py JSON line/file or the driver's wrapped
    BENCH_r*.json ({"parsed": {...}}). Returns the detail dict + value."""
    with open(path) as f:
        data = json.load(f)
    if "parsed" in data:
        data = data["parsed"]
    if "detail" not in data:
        raise ValueError(f"{path}: no bench detail")
    d = dict(data["detail"])
    d["value"] = data.get("value", 0.0)
    if "error" in d:
        raise ValueError(f"{path}: bench errored: {d['error']}")
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cand", required=True, help="candidate npz")
    ap.add_argument("--gate-a", required=True,
                    help="bench JSON: candidate on stream a (10k, floors)")
    ap.add_argument("--gate-b", required=True,
                    help="bench JSON: candidate on stream b")
    ap.add_argument("--shipped-b", required=True,
                    help="bench JSON: SHIPPED params on stream b")
    ap.add_argument("--shipped-a-json", default="",
                    help="bench JSON for the shipped params on stream a "
                         "(e.g. the driver's BENCH_r03.json); its seg_iou "
                         "is the headline the candidate must meet")
    ap.add_argument("--shipped-a-seg-iou", type=float, default=None,
                    help="explicit headline override when no JSON exists")
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--dest", default=os.path.join(REPO, "params",
                                                   "parsenet_e2e.npz"))
    args = ap.parse_args()

    try:
        a = load_detail(args.gate_a)
        b = load_detail(args.gate_b)
        sb = load_detail(args.shipped_b)
    except (OSError, ValueError, KeyError) as e:
        print(f"promote: cannot evaluate gate: {e}", file=sys.stderr)
        raise SystemExit(2)
    if args.shipped_a_seg_iou is not None:
        shipped_a_iou = args.shipped_a_seg_iou
    elif args.shipped_a_json:
        try:
            shipped_a_iou = load_detail(args.shipped_a_json)["seg_iou"]
        except (OSError, ValueError, KeyError) as e:
            print(f"promote: cannot read shipped-a headline: {e}",
                  file=sys.stderr)
            raise SystemExit(2)
    else:
        print("promote: need --shipped-a-json or --shipped-a-seg-iou",
              file=sys.stderr)
        raise SystemExit(2)
    if not os.path.exists(args.cand):
        print(f"promote: candidate {args.cand} missing", file=sys.stderr)
        raise SystemExit(2)

    checks = [
        ("stream-a measured at 10k", a.get("num_points") == 10000),
        ("stream-a is stream a", a.get("stream", "a") == "a"),
        ("stream-a trained params", bool(a.get("trained_params"))),
        ("stream-a floors green", bool(a.get("quality_ok"))),
        (f"stream-a seg_iou {a['seg_iou']:.4f} >= shipped "
         f"{shipped_a_iou:.4f}", a["seg_iou"] >= shipped_a_iou),
        ("stream-b is stream b", b.get("stream") == "b"
         and sb.get("stream") == "b"),
        (f"stream-b seg_iou {b['seg_iou']:.4f} >= shipped-b "
         f"{sb['seg_iou']:.4f} - {args.noise}",
         b["seg_iou"] >= sb["seg_iou"] - args.noise),
        (f"stream-b sk_2 {b['sk_2']:.4f} >= shipped-b {sb['sk_2']:.4f} "
         f"- {args.noise}", b["sk_2"] >= sb["sk_2"] - args.noise),
    ]
    ok = True
    for name, passed in checks:
        print(f"promote: [{'PASS' if passed else 'FAIL'}] {name}")
        ok = ok and passed
    if not ok:
        print("promote: GATE FAILED — params/ untouched", file=sys.stderr)
        raise SystemExit(1)
    shutil.copyfile(args.cand, args.dest)
    print(f"promote: PROMOTED {args.cand} -> {args.dest} "
          f"(seg_iou {a['seg_iou']:.4f}, stream-b seg_iou {b['seg_iou']:.4f})")


if __name__ == "__main__":
    main()
