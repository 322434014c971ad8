"""Roofline tooling (scripts/roofline.py, VERDICT r4 task 4).

The stage table is only as good as the arm-time loader: the axon relay's
one-sided failure modes (slow claim / wedge recovery) inflated two round-5
ablation arms 41x/50x past the FULL pipeline, which would have driven the
subtraction-based stage costs negative. These tests pin the guards:
replicate arms merge by MIN time, and slower-than-full ablations are
dropped into an 'anomalous' section instead of corrupting the table.
"""
from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _roofline():
    spec = importlib.util.spec_from_file_location(
        "roofline", os.path.join(REPO, "scripts", "roofline.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _arm(name, shapes_per_hour, batch=4):
    return json.dumps({"arm": name, "result": {
        "value": shapes_per_hour, "detail": {"batch": batch}}})


def test_replicates_merge_by_min_time(tmp_path):
    rl = _roofline()
    p = tmp_path / "abl.jsonl"
    # recon measured twice: once degraded (slow relay), once healthy.
    p.write_text("\n".join([
        _arm("full", 26718.3),
        _arm("recon", 648.1),      # degraded: 22.2 s/batch
        _arm("recon2", 30000.0),   # healthy re-measure: 0.48 s/batch
    ]) + "\n")
    times = rl.load_arm_times(str(p))
    assert set(times) == {"full", "recon"}
    assert abs(times["recon"] - 4 * 3600.0 / 30000.0) < 1e-9


def test_anomalous_arms_dropped_not_subtracted(tmp_path):
    rl = _roofline()
    p = tmp_path / "abl.jsonl"
    p.write_text("\n".join([
        _arm("full", 26718.3),     # 0.539 s/batch
        _arm("ms", 38223.1),       # faster than full: real stage cost
        _arm("splines", 537.4),    # 26.8 s/batch: anomalous
    ]) + "\n")
    costs = rl.stage_costs(rl.load_arm_times(str(p)))
    anomalous = costs.pop("_anomalous")
    assert "splines" in anomalous and "splines" not in costs
    assert costs["ms"] > 0
    # net needs BOTH recon and ms; with recon missing it must not appear
    assert "net" not in costs


def test_error_records_and_blank_lines_skipped(tmp_path):
    rl = _roofline()
    p = tmp_path / "abl.jsonl"
    p.write_text(_arm("full", 26718.3) + "\n\n"
                 + json.dumps({"arm": "ms", "error": 124}) + "\n")
    times = rl.load_arm_times(str(p))
    assert set(times) == {"full"}


def test_end_to_end_writes_table(tmp_path, capsys):
    rl = _roofline()
    p = tmp_path / "abl.jsonl"
    p.write_text("\n".join([
        _arm("full", 26718.3),
        _arm("ms", 38223.1),
        _arm("recon", 648.1),       # anomalous — must surface in output
        _arm("residual", 27614.9),
    ]) + "\n")
    out = tmp_path / "roofline.json"
    rc = rl.main(["--ablate", str(p), "--out", str(out)])
    assert rc == 0
    data = json.loads(out.read_text())
    assert "recon" in data["anomalous_arm_times_s"]
    stages = {r["stage"] for r in data["stages"]}
    assert {"ms", "residual"} <= stages
    for row in data["stages"]:
        assert row["measured_ms"] > 0
        assert row["bound"] in ("compute", "bandwidth")
    assert "ANOMALOUS arm recon" in capsys.readouterr().out


def test_siou_arm_splits_pure_mean_shift(tmp_path):
    rl = _roofline()
    p = tmp_path / "abl.jsonl"
    # full 0.539 s/batch; ms-ablated saves 0.162 s; siou-ablated saves 0.065
    p.write_text("\n".join([
        _arm("full", 26718.3),
        _arm("ms", 38223.1),
        _arm("siou", 30392.0),
    ]) + "\n")
    times = rl.load_arm_times(str(p))
    costs = rl.stage_costs(times)
    costs.pop("_anomalous")
    combined = times["full"] - times["ms"]
    siou = times["full"] - times["siou"]
    assert abs(costs["siou"] - siou) < 1e-9
    assert abs(costs["ms"] - (combined - siou)) < 1e-9  # pure mean-shift


def test_siou_exceeding_combined_is_anomalous(tmp_path):
    rl = _roofline()
    p = tmp_path / "abl.jsonl"
    # siou arm "saves" more than the ms arm that stubs a superset — bogus
    p.write_text("\n".join([
        _arm("full", 26718.3),
        _arm("ms", 30392.0),
        _arm("siou", 38223.1),
    ]) + "\n")
    costs = rl.stage_costs(rl.load_arm_times(str(p)))
    anomalous = costs.pop("_anomalous")
    assert "siou" in anomalous and "siou" not in costs
    # ms keeps its raw (combined) cost when the split is rejected
    combined = 4 * 3600 / 26718.3 - 4 * 3600 / 30392.0
    assert abs(costs["ms"] - combined) < 1e-9


def test_variant_labels_do_not_fold_into_stage_arms(tmp_path):
    rl = _roofline()
    p = tmp_path / "abl.jsonl"
    p.write_text("\n".join([
        _arm("full", 26718.3),
        _arm("ms", 38223.1),
        _arm("ms2048", 50000.0),     # a variant, NOT a replicate of 'ms'
        _arm("recon2", 30000.0),     # single-digit suffix: replicate
    ]) + "\n")
    times = rl.load_arm_times(str(p))
    assert "ms2048" in times                      # kept distinct
    assert abs(times["ms"] - 4 * 3600 / 38223.1) < 1e-9   # not clobbered
    assert "recon" in times and "recon2" not in times     # merged


def test_net_cost_outside_full_is_anomalous(tmp_path):
    rl = _roofline()
    p = tmp_path / "abl.jsonl"
    # both arms individually pass the direct guard (faster than full) but
    # their inclusion-exclusion sum exceeds full => bogus net
    p.write_text("\n".join([
        _arm("full", 26718.3),      # 0.539 s
        _arm("ms", 27000.0),        # 0.533 s (cost 0.006)
        _arm("recon", 26800.0),     # 0.537 s (cost 0.002)
    ]) + "\n")
    costs = rl.stage_costs(rl.load_arm_times(str(p)))
    anomalous = costs.pop("_anomalous")
    # net = 0.533 + 0.537 - 0.539 = 0.531 < full: fine, NOT anomalous
    assert "net" in costs and 0 <= costs["net"] <= costs["full"]
    assert "net" not in anomalous

    p.write_text("\n".join([
        _arm("full", 20000.0),      # degraded full: 0.72 s
        _arm("ms", 8000.0),         # 1.8 s -> direct cost negative (dropped)
        _arm("recon", 9000.0),      # 1.6 s -> dropped too
    ]) + "\n")
    costs = rl.stage_costs(rl.load_arm_times(str(p)))
    anomalous = costs.pop("_anomalous")
    assert "ms" in anomalous and "recon" in anomalous
    assert "net" not in costs      # no surviving inputs -> no net row
