"""Remote-backend pre-flight probe with bounded fresh-process retries.

The tunneled TPU runtime's claim leg has two observed failure modes
(NEXT.md incident log):

* a permanent wedge — a client blocks forever at zero CPU (2026-08-17,
  >90 min), which the bench watchdog converts into a diagnostic exit; and
* a slow handoff — a fresh client takes minutes to claim a chip
  (observed 302 s on 2026-08-19) before becoming fully healthy.

Both start the same way, and the documented workaround is process-level
re-exec: claims are per-process, so a fresh probe process is the only way
to test (and retry) the claim without poisoning the caller's own runtime.
`wait_for_backend` runs a trivial-jit probe in a subprocess, retrying with
fresh processes until the claim succeeds or a wall-clock budget expires.
Callers (bench.py) run it BEFORE starting their own backend so a transient
wedge becomes a delayed success instead of a zero-value round artifact.

Stdlib-only on purpose: importing this module must never initialize a jax
BACKEND (no chip claim). Note that reaching it via the package
(`parsenet_tpu.core.preflight`) does import jax itself through
core/__init__ — backend init stays lazy, but the import cost lands in the
caller; that is acceptable because every caller imports jax moments later
anyway.
"""
from __future__ import annotations

import os
import signal
import subprocess
import sys
import time
from typing import Callable, List, Optional

# Trivial jit: forces a real claim + compile + execute + fetch through the
# tunnel. An 8x8 elementwise program compiles in well under a second once
# the claim lands, so the probe's duration measures the claim leg itself.
PROBE_CODE = ("import jax, jax.numpy as jnp; "
              "x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 8))); "
              "print(float(x.block_until_ready()[0, 0]))")


def default_probe_argv() -> List[str]:
    return [sys.executable, "-c", PROBE_CODE]


def wait_for_backend(probe_argv: Optional[List[str]] = None,
                     budget_s: float = 1500.0,
                     probe_timeout_s: float = 420.0,
                     sleep_s: float = 20.0,
                     log: Callable[[str], None] = None) -> bool:
    """Probe the backend in fresh subprocesses until one succeeds.

    Returns True as soon as a probe exits 0; False once `budget_s` of
    wall-clock has elapsed without a success. Each attempt is bounded by
    `probe_timeout_s` (a hung claim is killed, not waited out) and failed
    attempts are separated by `sleep_s` so a recovering relay is not
    hammered. `log` receives one human-readable line per failed attempt
    (defaults to stderr).
    """
    if probe_argv is None:
        probe_argv = default_probe_argv()
    if log is None:
        log = lambda m: print(m, file=sys.stderr, flush=True)
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        left = budget_s - (time.monotonic() - t0)
        if left <= 0:
            log(f"preflight: backend still unreachable after {attempt - 1} "
                f"attempts / {budget_s:.0f}s budget")
            return False
        tmo = min(probe_timeout_s, max(left, 0.05))
        # own session/process group + group kill on timeout: a wedged jax
        # runtime can spawn helpers that inherit the pipes, and killing only
        # the direct child would leave communicate() blocked on them — the
        # exact hang this module exists to bound
        proc = subprocess.Popen(probe_argv, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True,
                                start_new_session=True)
        try:
            out, _ = proc.communicate(timeout=tmo)
            if proc.returncode == 0:
                if attempt > 1:
                    log(f"preflight: backend recovered on attempt {attempt} "
                        f"({time.monotonic() - t0:.0f}s)")
                return True
            why = f"exit {proc.returncode}: {(out or '').strip()[-200:]}"
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            try:
                proc.communicate(timeout=5)
            except subprocess.TimeoutExpired:
                pass
            why = f"probe hung > {tmo:.0f}s (claim leg wedged?)"
        log(f"preflight: attempt {attempt} failed ({why}); retrying")
        time.sleep(min(sleep_s, max(budget_s - (time.monotonic() - t0), 0)))
