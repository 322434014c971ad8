"""Queue scripts must bank their terminal results (round-4 verdict weak #1).

Rounds 3 AND 4 both stranded their best results in gitignored logs/ —
the from-scratch lineage that beats the shipped params sat invisible to
git for a full round. The contract is now: every queue ends by copying
terminal artifacts into committed artifacts/ via scripts/queue_lib.sh's
`bank`, and promotion goes through scripts/promote_candidate.py rather
than a "queue complete" + grep.

These tests run a STUB queue through the real queue_lib.sh and assert the
artifacts land outside gitignored paths.
"""
from __future__ import annotations

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUEUE_LIB = os.path.join(REPO, "scripts", "queue_lib.sh")


def _run_stub_queue(tmp_path, body):
    script = tmp_path / "run_stub.sh"
    script.write_text("#!/bin/sh\nset -u\n"
                      f". {QUEUE_LIB}\n" + body)
    script.chmod(0o755)
    return subprocess.run(["/bin/sh", str(script)], cwd=tmp_path,
                          capture_output=True, text=True)


def test_bank_lands_results_in_artifacts(tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "gate_a.json").write_text('{"seg_iou": 0.89}')
    (logs / "gate_b.json").write_text('{"seg_iou": 0.90}')
    r = _run_stub_queue(
        tmp_path,
        'echo "queue work..."\n'
        "bank logs/gate_a.json logs/gate_b.json\n")
    assert r.returncode == 0, r.stdout + r.stderr
    art = tmp_path / "artifacts"
    assert (art / "gate_a.json").read_text() == '{"seg_iou": 0.89}'
    assert (art / "gate_b.json").read_text() == '{"seg_iou": 0.90}'


def test_bank_reports_missing_but_banks_the_rest(tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "present.json").write_text("{}")
    r = _run_stub_queue(
        tmp_path,
        "bank logs/gone.json logs/present.json || missing=$?\n"
        'echo "missing_rc=${missing:-0}"\n')
    assert "MISSING logs/gone.json" in r.stderr
    assert "missing_rc=1" in r.stdout
    assert (tmp_path / "artifacts" / "present.json").exists()


def test_gitignore_does_not_cover_artifacts():
    with open(os.path.join(REPO, ".gitignore")) as f:
        lines = [ln.strip() for ln in f]
    assert not any(ln.strip("/") == "artifacts" for ln in lines)
    # and the stranding dirs ARE ignored (that is WHY bank exists)
    assert any(ln.strip("/") == "logs" for ln in lines)


def test_live_queues_bank_or_promote():
    """Every queue script that produces terminal JSONs must reference the
    banking/promotion tooling — a 'queue complete' + grep ending is the
    exact anti-pattern that stranded two rounds of results."""
    scripts_dir = os.path.join(REPO, "scripts")
    queues = [f for f in os.listdir(scripts_dir)
              if f.startswith("run_") and f.endswith(".sh")]
    for q in queues:
        with open(os.path.join(scripts_dir, q)) as f:
            text = f.read()
        assert "bank" in text or "promote_candidate" in text, (
            f"scripts/{q} does not bank its results "
            "(source scripts/queue_lib.sh and call bank <terminal "
            "artifacts> at the end)")
