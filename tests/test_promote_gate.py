"""Two-stream promotion gate + bench self-description guards (round 5).

Round 4's from-scratch lineage was gated with ITS OWN SplineNet decoders
(BENCH_SPLINE_DIR) but the promotion tool could only ship the e2e npz — an
e2e-only promotion would have paired it with the OLD decoders in params/
and silently measured wrong quality forever after (round-4 verdict weak
#2). These tests pin the round-5 contract:

  * bundle promotion is atomic: all three files exist before any is
    copied, and a missing decoder ships NOTHING;
  * the stream-b arms must be the same full-scale trained protocol as
    stream a (round-4 advisor finding: a reduced-scale b-measurement would
    silently satisfy the noise band);
  * gate artifacts self-describe their decoder source ("spline_src") and
    the promotion mode must match it;
  * bench.py hard-fails fast on a typo'd BENCH_STREAM and on an explicit
    BENCH_SPLINE_DIR whose checkpoints are missing (no silent fallback to
    the shipped decoders).

All tests are pure file/process manipulation — no model, no compile.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROMOTE = os.path.join(REPO, "scripts", "promote_candidate.py")


def _detail(stream="a", seg_iou=0.89, sk_2=0.86, num_points=10000,
            trained=True, quality_ok=True, **extra):
    d = {"stream": stream, "seg_iou": seg_iou, "sk_2": sk_2,
         "residual": 0.011, "num_points": num_points,
         "trained_params": trained, "quality_ok": quality_ok}
    d.update(extra)
    return {"metric": "abc_shapes_per_hour_e2e", "value": 28000.0,
            "detail": d}


def _write(path, obj):
    with open(path, "w") as f:
        json.dump(obj, f)
    return str(path)


@pytest.fixture()
def gate_files(tmp_path):
    """A green gate: candidate + decoders + three bench artifacts + dest."""
    cand = tmp_path / "cand_e2e.npz"
    cand.write_bytes(b"E2E")
    for n in ("open_splinenet", "closed_splinenet"):
        (tmp_path / f"cand_{n}.npz").write_bytes(b"DEC-" + n.encode())
    dest_dir = tmp_path / "params"
    dest_dir.mkdir()
    return {
        "cand": str(cand),
        "prefix": str(tmp_path / "cand_"),
        "dest_dir": dest_dir,
        "gate_a": _write(tmp_path / "a.json", _detail()),
        "gate_b": _write(tmp_path / "b.json", _detail(stream="b")),
        "shipped_b": _write(tmp_path / "sb.json",
                            _detail(stream="b", seg_iou=0.858, sk_2=0.833)),
        "tmp": tmp_path,
    }


def _run_promote(g, extra=(), gate_a=None, gate_b=None):
    cmd = [sys.executable, PROMOTE,
           "--cand", g["cand"],
           "--gate-a", gate_a or g["gate_a"],
           "--gate-b", gate_b or g["gate_b"],
           "--shipped-b", g["shipped_b"],
           "--shipped-a-seg-iou", "0.8732",
           "--dest", str(g["dest_dir"] / "parsenet_e2e.npz"),
           *extra]
    return subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)


class TestBundlePromotion:
    def test_green_gate_ships_full_bundle(self, gate_files):
        g = gate_files
        r = _run_promote(g, extra=["--cand-spline-prefix", g["prefix"],
                                   "--params-dir", str(g["dest_dir"])])
        assert r.returncode == 0, r.stdout + r.stderr
        assert (g["dest_dir"] / "parsenet_e2e.npz").read_bytes() == b"E2E"
        for n in ("open_splinenet", "closed_splinenet"):
            got = (g["dest_dir"] / f"{n}.npz").read_bytes()
            assert got == b"DEC-" + n.encode()

    def test_missing_decoder_ships_nothing(self, gate_files):
        g = gate_files
        os.remove(g["prefix"] + "closed_splinenet.npz")
        r = _run_promote(g, extra=["--cand-spline-prefix", g["prefix"]])
        assert r.returncode == 2
        assert not (g["dest_dir"] / "parsenet_e2e.npz").exists()

    def test_reduced_scale_stream_b_fails_gate(self, gate_files):
        g = gate_files
        bad_b = _write(g["tmp"] / "b_small.json",
                       _detail(stream="b", num_points=2500))
        r = _run_promote(g, gate_b=bad_b)
        assert r.returncode == 1
        assert "stream-b measured at 10k" in r.stdout
        assert not (g["dest_dir"] / "parsenet_e2e.npz").exists()

    def test_untrained_stream_b_fails_gate(self, gate_files):
        g = gate_files
        bad_b = _write(g["tmp"] / "b_rand.json",
                       _detail(stream="b", trained=False))
        r = _run_promote(g, gate_b=bad_b)
        assert r.returncode == 1
        assert not (g["dest_dir"] / "parsenet_e2e.npz").exists()

    def test_spline_src_mismatch_fails(self, gate_files):
        g = gate_files
        # gated with the SHIPPED decoders but asking for bundle promotion
        a_shipped = _write(g["tmp"] / "a_shipped.json",
                           _detail(spline_src="params"))
        r = _run_promote(g, extra=["--cand-spline-prefix", g["prefix"]],
                         gate_a=a_shipped)
        assert r.returncode == 1
        # gated with candidate decoders but promoting e2e only
        a_cand = _write(g["tmp"] / "a_cand.json",
                        _detail(spline_src="logs_scratch/checkpoints"))
        r = _run_promote(g, gate_a=a_cand)
        assert r.returncode == 1
        assert not (g["dest_dir"] / "parsenet_e2e.npz").exists()

    def test_e2e_only_promotion_still_works(self, gate_files):
        g = gate_files
        r = _run_promote(g)
        assert r.returncode == 0, r.stdout + r.stderr
        assert (g["dest_dir"] / "parsenet_e2e.npz").read_bytes() == b"E2E"

    def test_bank_copies_gate_artifacts(self, gate_files):
        g = gate_files
        bank = g["tmp"] / "artifacts"
        r = _run_promote(g, extra=["--bank", str(bank)])
        assert r.returncode == 0, r.stdout + r.stderr
        assert sorted(os.listdir(bank)) == ["a.json", "b.json", "sb.json"]


class TestBenchGuards:
    def _run_bench(self, env_extra, timeout=120):
        env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
                   BENCH_PREFLIGHT="0", BENCH_WATCHDOG_S="0",
                   JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache",
                   **env_extra)
        return subprocess.run(
            [sys.executable, "-c",
             "import bench; bench.check_spline_dir()"],
            capture_output=True, text=True, cwd=REPO, env=env,
            timeout=timeout)

    def test_typo_stream_fails_fast(self):
        r = self._run_bench({"BENCH_STREAM": "B"})
        assert r.returncode != 0
        assert "BENCH_STREAM" in r.stderr

    def test_explicit_spline_dir_missing_is_hard_error(self, tmp_path):
        r = self._run_bench({"BENCH_SPLINE_DIR": str(tmp_path / "gone")})
        assert r.returncode != 0
        assert "refusing to silently fall back" in r.stderr

    def test_spline_source_resolution(self, tmp_path):
        sys.path.insert(0, REPO)
        try:
            import bench
        finally:
            sys.path.remove(REPO)
        # empty checkpoint dirs -> committed params npz
        for n in ("open_splinenet", "closed_splinenet"):
            (tmp_path / "checkpoints" / n).mkdir(parents=True)
        assert bench.spline_source(str(tmp_path)) == "params"
        # populated checkpoint dirs -> the training dir
        for n in ("open_splinenet", "closed_splinenet"):
            (tmp_path / "checkpoints" / n / "12").mkdir()
        assert bench.spline_source(str(tmp_path)) == \
            f"{tmp_path}/checkpoints"


class TestGateArtifactSemantics:
    """Round-5 bench detail fields the gate must enforce: quality_ok is
    vacuously true when floors were not applied (floors_applied=false) and
    an ablated pipeline (BENCH_ABLATE) stubs stages — e.g. ablate=ms
    records seg_iou 1.0. Neither may pass the shipping gate."""

    def test_floors_not_applied_fails_gate(self, gate_files):
        g = gate_files
        bad_a = _write(g["tmp"] / "a_nofloors.json",
                       _detail(floors_applied=False))
        r = _run_promote(g, gate_a=bad_a)
        assert r.returncode == 1
        assert "floors actually applied" in r.stdout
        assert not (g["dest_dir"] / "parsenet_e2e.npz").exists()

    def test_ablated_artifact_fails_gate(self, gate_files):
        g = gate_files
        # an ablate=ms run stubs SIOU to 1.0 and reports quality_ok=true
        # with floors_applied=false; even if floors_applied were forged
        # true, the ablate field alone must fail the gate
        bad_a = _write(g["tmp"] / "a_ablate.json",
                       _detail(seg_iou=1.0, ablate="ms",
                               floors_applied=True))
        r = _run_promote(g, gate_a=bad_a)
        assert r.returncode == 1
        assert "no stage ablated" in r.stdout
        assert not (g["dest_dir"] / "parsenet_e2e.npz").exists()

    def test_ablated_stream_b_fails_gate(self, gate_files):
        g = gate_files
        bad_b = _write(g["tmp"] / "b_ablate.json",
                       _detail(stream="b", ablate="residual"))
        r = _run_promote(g, gate_b=bad_b)
        assert r.returncode == 1
        assert not (g["dest_dir"] / "parsenet_e2e.npz").exists()

    def test_random_spline_src_fails_bundle_promotion(self, gate_files):
        g = gate_files
        # spline_src='random' = NO decoders were restorable; the gate
        # measured randomly initialized SplineNets — not candidate decoders
        a_rand = _write(g["tmp"] / "a_rand.json",
                        _detail(spline_src="random"))
        r = _run_promote(g, extra=["--cand-spline-prefix", g["prefix"],
                                   "--params-dir", str(g["dest_dir"])],
                         gate_a=a_rand)
        assert r.returncode == 1
        assert not (g["dest_dir"] / "parsenet_e2e.npz").exists()
        assert not (g["dest_dir"] / "open_splinenet.npz").exists()

    def test_legacy_artifacts_without_fields_still_pass(self, gate_files):
        # pre-round-5 artifacts have neither floors_applied nor ablate;
        # they were full floor-evaluated runs and must keep passing
        g = gate_files
        r = _run_promote(g)
        assert r.returncode == 0, r.stdout + r.stderr
