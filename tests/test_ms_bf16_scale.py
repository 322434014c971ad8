"""Production-scale mean-shift parity: Pallas kernel vs f32 XLA (N=2048,
D=128, guard-computed bandwidths incl. escalation-triggering regimes).

Round 2 claimed "bf16 labels identical" from small-N CPU fuzz (N~60, d=8)
plus the on-chip bench floor. This file is the CPU-reproducible witness near
production scale — and it QUANTIFIES the claim instead of over-stating it:

* the f32 Pallas kernel reproduces the XLA partition exactly in 28/30
  trials; the 2 exceptions are chaotic mode boundaries (a 1e-7 input
  perturbation flips the pure-XLA partition there too) with >= 0.98
  co-membership agreement and identical cluster counts.
* single-pass bf16 dots reproduce the partition exactly in most trials but
  CAN perturb mode boundaries when bandwidth escalation has inflated the
  bandwidth to near the inter-cluster separations: measured cluster-count
  drift <= 1 and co-membership agreement >= 0.88 over the fuzz. That is why
  bf16 is a BENCH perf knob (quality-floored, label-identical on the
  trained eval stream) and NOT the library default — parity paths keep the
  reference's f32 numerics (eval/pipeline.py predict_segmentation).

Partition = labels up to id numbering: the compacted ids depend on which
point index wins the center argmax (ties break on sub-1e-7 noise), and
everything downstream (to_one_hot -> Hungarian-matched SIOU, per-segment
vote) is invariant to the numbering.

Also covers the round-2 footgun: guard_mean_shift(differentiable=True,
use_pallas=True) must be differentiable (the accepted re-run takes the XLA
path; Pallas only accelerates the stop-gradient escalation attempts).
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _trained_like_embedding(rng, n, d, n_clusters, noise):
    """Unit-norm embedding like a trained seg net's: tight clusters on the
    sphere, cluster sizes drawn log-uniform (ABC segments are very uneven)."""
    c = rng.randn(n_clusters, d).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    w = np.exp(rng.uniform(0, 2.5, n_clusters))
    lab = rng.choice(n_clusters, size=n, p=w / w.sum())
    x = c[lab] + noise * rng.randn(n, d).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32), lab


def _same_partition(la: np.ndarray, lb: np.ndarray) -> bool:
    """True iff la and lb induce the same partition (bijection of ids)."""
    pairs = set(zip(la.tolist(), lb.tolist()))
    return len(pairs) == len(set(la.tolist())) == len(set(lb.tolist()))


def _agreement(la: np.ndarray, lb: np.ndarray) -> float:
    """Fraction of points whose lb id is the majority counterpart of their
    la id (1.0 = identical partition)."""
    M = np.zeros((la.max() + 1, lb.max() + 1), np.int64)
    np.add.at(M, (la, lb), 1)
    return float(M.max(axis=1).sum() / la.size)


class TestKernelScaleParity:
    """30 guard-regime trials at N=2048, D=128: bandwidth comes from the
    real guard (quantile 0.015, escalation active — 40/60-cluster trials
    escalate past the 49-cluster cap exactly like production)."""
    N, D = 2048, 128

    @pytest.fixture(scope="class")
    def trials(self):
        from parsenet_tpu.ops.mean_shift import guard_mean_shift, nms
        from parsenet_tpu.ops.pallas_kernels import \
            mean_shift_iterations_pallas
        rng = np.random.RandomState(11)
        out = []
        for t in range(30):
            n_clusters = [6, 12, 24, 40, 60][t % 5]
            noise = [0.01, 0.02, 0.03][t % 3]
            x, _ = _trained_like_embedding(rng, self.N, self.D,
                                           n_clusters, noise)
            X = jnp.asarray(x)
            ref = guard_mean_shift(X, 0.015, key=jax.random.PRNGKey(t),
                                   num_samples=self.N, iterations=10,
                                   differentiable=False)
            row = {"t": t, "k_ref": int(ref.num_clusters),
                   "labels_ref": np.asarray(ref.labels)}
            for name, bf16 in (("f32", False), ("bf16", True)):
                s = mean_shift_iterations_pallas(X, ref.bandwidth, 10,
                                                 interpret=True,
                                                 bf16_dots=bf16)
                _, lab, k = nms(s, X, ref.bandwidth)
                row[name] = (np.asarray(lab), int(k))
            out.append(row)
        return out

    def test_f32_kernel_partition_fidelity(self, trials):
        """The Pallas kernel itself (f32 dots) is partition-faithful: >= 26
        of 30 exact (measured 28; the rest are chaotic boundaries that flip
        under 1e-7 input perturbation of the pure-XLA path too), agreement
        >= 0.97 and identical cluster counts everywhere."""
        exact = 0
        for row in trials:
            lab, k = row["f32"]
            assert k == row["k_ref"], row["t"]
            if _same_partition(row["labels_ref"], lab):
                exact += 1
            else:
                assert _agreement(row["labels_ref"], lab) >= 0.97, row["t"]
        assert exact >= 26, exact

    def test_bf16_dots_bounded_divergence(self, trials):
        """Single-pass bf16 dots: >= 22/30 exact partitions (measured 25),
        cluster-count drift <= 1, co-membership agreement >= 0.85
        (measured floor 0.885, on an escalated 60-cluster trial). This is
        the quantified tradeoff behind the BENCH_MS_BF16 perf knob."""
        exact = 0
        for row in trials:
            lab, k = row["bf16"]
            assert abs(k - row["k_ref"]) <= 1, row["t"]
            if _same_partition(row["labels_ref"], lab) and k == row["k_ref"]:
                exact += 1
            else:
                assert _agreement(row["labels_ref"], lab) >= 0.85, row["t"]
        assert exact >= 22, exact

    def test_production_iteration_count(self):
        """Two well-separated trials at the production 50-iteration count
        (the fuzz uses 10 to keep the suite fast; 50 iterations compound
        any bf16 drift): exact partition parity."""
        from parsenet_tpu.ops.mean_shift import mean_shift_iterations, nms
        from parsenet_tpu.ops.pallas_kernels import \
            mean_shift_iterations_pallas
        rng = np.random.RandomState(7)
        for n_clusters, bw in ((24, 0.3), (48, 0.45)):
            x, _ = _trained_like_embedding(rng, self.N, self.D,
                                           n_clusters, 0.04)
            X = jnp.asarray(x)
            bwj = jnp.float32(bw)
            a = mean_shift_iterations(X, bwj, 50)
            b = mean_shift_iterations_pallas(X, bwj, 50, interpret=True,
                                             bf16_dots=True)
            _, la, ka = nms(a, X, bwj)
            _, lb, kb = nms(b, X, bwj)
            assert int(ka) == int(kb)
            assert _same_partition(np.asarray(la), np.asarray(lb))

    def test_guard_escalation_bf16(self):
        """Full guard with the bf16 Pallas kernel in an escalation-
        triggering regime (60 tight clusters, quantile 0.002 -> >49
        clusters -> bandwidth doubling fires): partition + accepted
        bandwidth match the pure-XLA guard."""
        from parsenet_tpu.ops.mean_shift import guard_mean_shift
        rng = np.random.RandomState(3)
        x, _ = _trained_like_embedding(rng, self.N, self.D, 60, 0.02)
        X = jnp.asarray(x)
        kw = dict(key=jax.random.PRNGKey(0), num_samples=self.N,
                  iterations=10, differentiable=False)
        ref = guard_mean_shift(X, 0.002, **kw)
        pal = guard_mean_shift(X, 0.002, use_pallas=True, pallas_bf16=True,
                               pallas_interpret=True, **kw)
        assert int(ref.num_clusters) == int(pal.num_clusters)
        assert abs(float(ref.bandwidth) - float(pal.bandwidth)) < 1e-6
        assert _same_partition(np.asarray(ref.labels), np.asarray(pal.labels))


class TestDifferentiablePallasPath:
    def test_grad_through_guard_with_pallas(self):
        """differentiable=True + use_pallas=True must yield finite gradients:
        the accepted re-run takes the XLA path (the Pallas kernel has no VJP
        and would be a TPU-only trace error if differentiated). Interpret
        mode exercises the exact combination on CPU."""
        from parsenet_tpu.ops.mean_shift import guard_mean_shift
        rng = np.random.RandomState(0)
        x, _ = _trained_like_embedding(rng, 256, 16, 5, 0.03)

        def loss(e):
            res = guard_mean_shift(e, 0.05, key=jax.random.PRNGKey(0),
                                   num_samples=256, iterations=5,
                                   use_pallas=True, pallas_bf16=True,
                                   pallas_interpret=True,
                                   differentiable=True)
            return jnp.sum(res.shifted ** 2)

        g = jax.grad(loss)(jnp.asarray(x))
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.max(jnp.abs(g))) > 0.0
        # and the forward agrees with the pure-XLA differentiable guard
        from parsenet_tpu.ops.mean_shift import guard_mean_shift as gms
        a = gms(jnp.asarray(x), 0.05, key=jax.random.PRNGKey(0),
                num_samples=256, iterations=5, differentiable=True)
        b = gms(jnp.asarray(x), 0.05, key=jax.random.PRNGKey(0),
                num_samples=256, iterations=5, use_pallas=True,
                pallas_bf16=True, pallas_interpret=True, differentiable=True)
        np.testing.assert_allclose(np.asarray(a.shifted),
                                   np.asarray(b.shifted), atol=1e-6)
