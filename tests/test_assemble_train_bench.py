"""assemble_train_bench: the round train-bench artifact builder must pick
the LAST JSON line (bench logs carry warnings above it) and compute
vs_round1 ratios."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_assembles_from_noisy_logs(tmp_path):
    seg = tmp_path / "seg.json"
    seg.write_text("WARNING: platform axon is experimental\n"
                   '{"metric": "seg_train_shapes_per_sec", "value": 18.2, '
                   '"unit": "shapes/s", "detail": {"batch": 2}}\n')
    e2e = tmp_path / "e2e.json"
    e2e.write_text('{"metric": "e2e_train_shapes_per_sec", "value": 5.8, '
                   '"unit": "shapes/s", "detail": {}}\n')
    out = tmp_path / "out.json"
    r = subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts",
                                     "assemble_train_bench.py"),
                        str(seg), str(e2e), str(out)],
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    data = json.loads(out.read_text())
    m = data["metrics"]
    assert m["seg_train_shapes_per_sec"]["value"] == 18.2
    assert abs(m["seg_train_shapes_per_sec"]["vs_round1"] - 18.2 / 9.1) < 1e-9
    assert abs(m["e2e_train_shapes_per_sec"]["vs_round1"] - 5.8 / 2.9) < 1e-9
