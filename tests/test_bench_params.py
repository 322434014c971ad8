"""BENCH_PARAMS must be authoritative (VERDICT round-3 task 4).

Round 3's shipping gate measured the right weights only by luck: bench.py
restored any orbax checkpoint under logs/checkpoints/parsenet_e2e BEFORE
consulting BENCH_PARAMS, so a stale/half-finished training checkpoint in
that directory would silently shadow the candidate the gate thinks it is
measuring. These tests plant exactly that decoy and assert the explicit
npz wins — and that an explicit-but-broken BENCH_PARAMS is a hard error,
never a silent fallback to a different model.
"""
from __future__ import annotations

import os
import sys

# bench.py runs preflight/watchdog wiring at import; neutralize both BEFORE
# the module import below (the conftest already pins the cpu platform, but
# the sitecustomize env still says JAX_PLATFORMS=axon in this process)
os.environ["BENCH_PREFLIGHT"] = "0"
os.environ["BENCH_WATCHDOG_S"] = "0"
# keep the import's jax.config cache-dir update pointed at the test cache
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from parsenet_tpu.core.checkpoint import Checkpointer, flatten_tree  # noqa: E402
from parsenet_tpu.models.dgcnn import PrimitivesEmbedding  # noqa: E402


@pytest.fixture()
def small_model():
    return PrimitivesEmbedding(emb_size=16, num_primitives=10, mode=5, k=4)


def _two_param_sets(model):
    """Same tree structure, different leaf values, tagged distinguishably."""
    p_orbax = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 6)))[
        "params"]
    p_npz = jax.tree_util.tree_map(lambda a: a + 1.0, p_orbax)
    return p_orbax, p_npz


def _write_npz(path, params):
    flat = {k: np.asarray(v, np.float32)
            for k, v in flatten_tree({"params": params}).items()}
    np.savez_compressed(path, **flat)


def _first_leaf(params):
    return np.asarray(jax.tree_util.tree_leaves(params)[0])


class TestBenchParamsAuthoritative:
    def test_explicit_npz_beats_decoy_orbax(self, small_model, tmp_path,
                                            monkeypatch):
        p_orbax, p_npz = _two_param_sets(small_model)
        monkeypatch.chdir(tmp_path)
        Checkpointer("logs/checkpoints/parsenet_e2e").save(
            0, {"params": p_orbax})
        _write_npz(tmp_path / "cand.npz", p_npz)
        monkeypatch.setenv("BENCH_PARAMS", str(tmp_path / "cand.npz"))
        got, trained = bench.load_trained_params(small_model)
        assert trained
        np.testing.assert_allclose(_first_leaf(got), _first_leaf(p_npz),
                                   atol=1e-6)

    def test_explicit_missing_npz_is_hard_error(self, small_model, tmp_path,
                                                monkeypatch):
        p_orbax, _ = _two_param_sets(small_model)
        monkeypatch.chdir(tmp_path)
        Checkpointer("logs/checkpoints/parsenet_e2e").save(
            0, {"params": p_orbax})
        monkeypatch.setenv("BENCH_PARAMS", str(tmp_path / "nope.npz"))
        with pytest.raises(SystemExit):
            bench.load_trained_params(small_model)

    def test_unset_env_still_prefers_orbax(self, small_model, tmp_path,
                                           monkeypatch):
        p_orbax, p_npz = _two_param_sets(small_model)
        monkeypatch.chdir(tmp_path)
        Checkpointer("logs/checkpoints/parsenet_e2e").save(
            0, {"params": p_orbax})
        os.makedirs("params", exist_ok=True)
        _write_npz("params/parsenet_e2e.npz", p_npz)
        monkeypatch.delenv("BENCH_PARAMS", raising=False)
        got, trained = bench.load_trained_params(small_model)
        assert trained
        np.testing.assert_allclose(_first_leaf(got), _first_leaf(p_orbax),
                                   atol=1e-6)

    def test_npz_fallback_when_no_orbax(self, small_model, tmp_path,
                                        monkeypatch):
        _, p_npz = _two_param_sets(small_model)
        monkeypatch.chdir(tmp_path)
        os.makedirs("params", exist_ok=True)
        _write_npz("params/parsenet_e2e.npz", p_npz)
        monkeypatch.delenv("BENCH_PARAMS", raising=False)
        got, trained = bench.load_trained_params(small_model)
        assert trained
        np.testing.assert_allclose(_first_leaf(got), _first_leaf(p_npz),
                                   atol=1e-6)
