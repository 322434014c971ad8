"""End-to-end data-day drill (round-4 verdict task 8).

Runs scripts/data_day_drill.py at tiny scale: build a file:// fixture with
the reference download's layout (data.zip with 5 h5s + predictions.h5),
fetch it through scripts/fetch_dataset.py with sha256 pins, schema-validate
the landed tree, and run the full two-stage parity protocol
(scripts/validate_reference.py) on the fetched data with the shipped
params. Green means real-data day needs zero code changes — only the URL
and the published checksums.
"""
from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_data_day_chain_is_green(tmp_path):
    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "data_day_drill.py"),
         "--workdir", str(tmp_path / "drill"),
         "--points", "1024", "--shapes", "8", "--eval-shapes", "1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "schema OK" in r.stdout
    assert "=== parity vs" in r.stdout
    assert "drill: GREEN" in r.stdout
