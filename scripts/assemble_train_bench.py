"""Assemble the round train-bench artifact (VERDICT round-2 task 1).

Reads the one-line JSON outputs of `scripts/bench_train.py seg` and
`scripts/bench_train.py e2e` (files or literal JSON) and writes a single
artifact with both step rates plus the round-1 baselines they are compared
against, so the driver/judge can diff training throughput across rounds the
same way BENCH_r*.json diffs inference.

Usage:
  python scripts/assemble_train_bench.py /tmp/bt_seg_r03.json \
      /tmp/bt_e2e_r03.json BENCH_TRAIN_r03.json
"""
import json
import sys

ROUND1 = {"seg_train_shapes_per_sec": 9.1, "e2e_train_shapes_per_sec": 2.9}


def read_line(path: str) -> dict:
    with open(path) as f:
        lines = [l for l in f.read().splitlines() if l.strip().startswith("{")]
    if not lines:
        raise SystemExit(f"{path}: no JSON line")
    return json.loads(lines[-1])


def main():
    seg, e2e, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    out = {"metrics": {}}
    for rec in (read_line(seg), read_line(e2e)):
        m = rec["metric"]
        out["metrics"][m] = {
            "value": rec["value"], "unit": rec["unit"],
            "detail": rec.get("detail", {}),
            "round1_baseline": ROUND1.get(m),
            "vs_round1": (rec["value"] / ROUND1[m]) if m in ROUND1 else None,
        }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
