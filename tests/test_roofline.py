"""scripts/roofline.py — stage-cost algebra and report shape.

The roofline statement (round-4 verdict task 4) turns the queue's
BENCH_ABLATE arm table into per-stage costs by ground-truth-ablation
subtraction; these tests pin the algebra (incl. the inclusion-exclusion
net isolation) and the artifact schema on a synthetic arm table.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import roofline


def _write_arms(path, times_s):
    # times are per-batch seconds; bench value is shapes/hour at batch B
    with path.open("w") as f:
        for arm, t in times_s.items():
            v = roofline.B * 3600.0 / t
            rec = {"arm": arm, "result": {
                "metric": "shapes_per_hour", "value": v,
                "detail": {"batch": roofline.B}}}
            f.write(json.dumps(rec) + "\n")
        # error records must be ignored
        f.write(json.dumps({"arm": "coverage", "error": 124}) + "\n")


def test_stage_cost_algebra(tmp_path):
    # full 0.5 s; ablating ms saves 0.1, recon saves 0.25, splines 0.05
    arms = {"full": 0.5, "ms": 0.4, "recon": 0.25, "splines": 0.45,
            "residual": 0.48, "preprocess": 0.49}
    p = tmp_path / "arms.jsonl"
    _write_arms(p, arms)
    times = roofline.load_arm_times(str(p))
    assert abs(times["full"] - 0.5) < 1e-9
    costs = roofline.stage_costs(times)
    assert abs(costs["ms"] - 0.1) < 1e-9
    assert abs(costs["recon"] - 0.25) < 1e-9
    # net = t(recon-ablated) + t(ms-ablated) - t(full) = 0.25 + 0.4 - 0.5
    assert abs(costs["net"] - 0.15) < 1e-9
    assert abs(costs["splines"] - 0.05) < 1e-9


def test_report_artifact(tmp_path, capsys):
    arms = {"full": 0.512, "ms": 0.40, "recon": 0.26, "splines": 0.47,
            "residual": 0.49, "coverage": 0.50, "preprocess": 0.505}
    p = tmp_path / "arms.jsonl"
    _write_arms(p, arms)
    out = tmp_path / "roofline.json"
    rc = roofline.main(["--ablate", str(p), "--out", str(out)])
    assert rc == 0
    rep = json.loads(out.read_text())
    stages = {r["stage"]: r for r in rep["stages"]}
    # every modeled stage present, with both utilization numbers
    for s in ("net", "ms", "splines", "residual", "coverage", "preprocess"):
        assert s in stages
        assert stages[s]["mfu_pct"] is not None
        assert stages[s]["hbm_util_pct"] is not None
        assert stages[s]["bound"] in ("compute", "bandwidth")
        # a physical floor can never exceed... the measured time CAN be
        # below a wrong model, but the report must carry the ratio
        assert stages[s]["fraction_of_floor"] is not None
    # residual map is elementwise — must be classified off the MXU roof
    assert stages["residual"]["model_gflops"] < 1.0
    # unattributed time = full - sum(stage costs) is reported
    assert "unattributed" in rep["per_batch_s"]


def test_missing_full_arm(tmp_path, capsys):
    p = tmp_path / "arms.jsonl"
    _write_arms(p, {"ms": 0.4})
    assert roofline.main(["--ablate", str(p),
                          "--out", str(tmp_path / "o.json")]) == 1
