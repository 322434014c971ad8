"""validate_reference.py must be able to measure the SHIPPED model.

Round 3's capstone kNN A/B produced an all-error artifact because
scripts/validate_reference.py only loaded an orbax checkpoint and hard-exited
when logs/checkpoints/<model_path> was empty — with no fallback to the
committed params/*.npz the way bench.py has (VERDICT round-3 missing #2 /
weak #1). This test runs one real validate_reference arm, in a subprocess,
against an npz-only tree (empty orbax dir) at reduced scale and asserts it
loads the shipped export and prints a complete parity table.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

h5py = pytest.importorskip("h5py")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable

N_PTS = 256


@pytest.mark.slow
def test_validate_reference_npz_only_tree(tmp_path):
    from parsenet_tpu.data.synthetic import write_abc_h5
    shapes = tmp_path / "shapes"
    shapes.mkdir()
    for split, seed in (("val", 11), ("test", 12)):
        write_abc_h5(str(shapes / f"{split}_data.h5"), 2, num_points=N_PTS,
                     seed=seed)
    cfg = tmp_path / "cfg_eval_npz.yml"
    cfg.write_text(
        "[train]\n"
        'model_path = "validate_npz_only"\n'      # empty orbax dir
        f'dataset = "{shapes}/"\n'
        f'log_dir = "{tmp_path}/logs"\n'
        "normals = True\n"
        "num_train = 0\nnum_val = 2\nnum_test = 2\n"
        f"num_points = {N_PTS}\n"
        "grid_size = 20\nbatch_size = 1\nmode = 5\nknn_k = 8\n")

    env = dict(os.environ)
    env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
                "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache"})
    out = subprocess.run(
        [PY, os.path.join(REPO, "scripts", "validate_reference.py"),
         str(cfg), "--num-shapes", "1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "evaluating params from" in out.stdout
    assert "parsenet_e2e.npz" in out.stdout  # the shipped export, not orbax
    line = next(l for l in reversed(out.stdout.splitlines())
                if l.startswith("{"))
    rec = json.loads(line)
    assert rec["n_shapes"] == 1
    assert {r["metric"] for r in rec["rows"]} == {
        "seg_iou", "prim_iou", "residual", "cov", "sk_1", "sk_2"}


def test_ab_knn_recall_exits_nonzero_on_failed_arm(tmp_path):
    """Round 3's A/B runner logged rc=0 over an all-error table; a failed
    arm must now fail the whole script so chained runners notice."""
    env = dict(os.environ)
    env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
                "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache"})
    out = subprocess.run(
        [PY, os.path.join(REPO, "scripts", "ab_knn_recall.py"),
         "--settings", "exact", "--num-shapes", "1",
         "--config", str(tmp_path / "missing.yml"),
         "--json-out", str(tmp_path / "ab.json"), "--timeout", "300"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 1, (out.returncode, out.stdout[-500:])
    assert "FAILED arms" in out.stderr
    with open(tmp_path / "ab.json") as f:
        assert "error" in json.load(f)["results"]["exact"]
