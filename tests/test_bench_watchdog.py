"""bench.py relay-wedge watchdog: if no result lands within the budget, the
bench must emit a diagnostic JSON line and exit (code 2) instead of hanging
forever — the driver's end-of-round bench must never block on a wedged
remote-TPU relay (observed 2026-08-17: a fresh client's claim leg hung >90
minutes at zero CPU)."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_watchdog_fires_and_reports():
    env = dict(os.environ)
    # force CPU the way CLAUDE.md prescribes; tiny budget so the watchdog
    # beats even the interpreter startup + first compile
    env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
                "BENCH_WATCHDOG_S": "3", "BENCH_POINTS": "640",
                "BENCH_BATCH": "1", "BENCH_ITERS": "1",
                "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache"})
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         cwd=REPO, env=env, capture_output=True, text=True,
                         timeout=120)
    assert out.returncode == 2, (out.returncode, out.stdout, out.stderr[-500:])
    line = next(l for l in out.stdout.splitlines() if l.startswith("{"))
    rec = json.loads(line)
    assert rec["metric"] == "abc_shapes_per_hour_e2e"
    assert rec["value"] == 0.0
    assert "watchdog" in rec["detail"]["error"]
