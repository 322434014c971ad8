"""Unit tests for scripts/diag_stream_offset.py (round-5 offset diagnostic).

The chip-side experiment is expensive (two full validate_reference runs);
these tests pin the cheap, correctness-critical plumbing: the bench-slice
h5 writer must reproduce bench.py's stream-a timed slice exactly (seed 7,
warmup offset 8), and the per-shape/summary parsing must survive noisy
subprocess stdout.
"""
import json
import os
import sys

import h5py
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import diag_stream_offset as diag  # noqa: E402


def test_write_bench_slice_matches_stream_a(tmp_path):
    from parsenet_tpu.data.synthetic import make_shape_batch

    n = 3
    nseg = diag.write_bench_slice(str(tmp_path) + "/", n)

    # reference: bench.py stream a = RandomState(7), timed slice starts
    # after WARMUP(2) * BATCH(4) = 8 shapes
    host = np.random.RandomState(7)
    pts, lab, _, _ = make_shape_batch(host, 8 + n, 10000)

    with h5py.File(tmp_path / "test_data.h5") as hf:
        assert hf["points"].shape == (n, 10000, 3)
        np.testing.assert_allclose(hf["points"][0], pts[8], rtol=0, atol=0)
        np.testing.assert_array_equal(hf["labels"][:], lab[8:8 + n])
        assert set(hf.keys()) >= {"points", "labels", "normals", "prim"}
    with h5py.File(tmp_path / "val_data.h5") as hf:
        assert hf["points"].shape[0] == 2  # tiny val split, pre-warmup shapes
        np.testing.assert_allclose(hf["points"][0], pts[0], rtol=0, atol=0)

    assert nseg == [int(len(set(l.tolist()))) for l in lab[8:8 + n]]


def test_run_validate_parses_per_shape_and_summary(tmp_path, monkeypatch):
    stdout = "\n".join([
        "compile log noise",
        "shape 0: seg_iou 0.91 residual 0.0101",
        "shape 1: seg_iou 0.82 residual 0.0203",
        "not a json line {",
        json.dumps({"rows": [{"metric": "seg_iou", "measured": 0.865}]}),
    ])

    class FakeOut:
        returncode = 0

        def __init__(self):
            self.stdout = stdout
            self.stderr = "warnings"

    monkeypatch.setattr(diag.subprocess, "run",
                        lambda *a, **k: FakeOut())
    log = tmp_path / "v.log"
    res = diag.run_validate("cfg.yml", 2, "exact", str(log))
    assert res["rc"] == 0
    assert res["per_shape"] == [
        {"i": 0, "seg_iou": 0.91, "residual": 0.0101},
        {"i": 1, "seg_iou": 0.82, "residual": 0.0203},
    ]
    assert res["summary"]["rows"][0]["measured"] == 0.865
    assert "--- stderr ---" in log.read_text()


def test_run_validate_handles_no_summary(tmp_path, monkeypatch):
    class FakeOut:
        returncode = 1
        stdout = "crash before any output"
        stderr = "traceback"

    monkeypatch.setattr(diag.subprocess, "run",
                        lambda *a, **k: FakeOut())
    res = diag.run_validate("cfg.yml", 2, "exact", str(tmp_path / "v.log"))
    assert res["rc"] == 1
    assert res["summary"] is None
    assert res["per_shape"] == []
