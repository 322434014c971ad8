"""Pallas kernels vs XLA reference implementations (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from parsenet_tpu.ops.mean_shift import mean_shift_iterations
from parsenet_tpu.ops.pallas_kernels import (mean_shift_iterations_pallas,
                                             mean_shift_step_pallas)


class TestMeanShiftKernel:
    def test_single_step_matches_xla(self, rng):
        n, d = 300, 8  # deliberately unaligned: exercises padding/masking
        x = rng.randn(n, d).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        X = jnp.asarray(x)
        bw = jnp.float32(0.3)
        ref = mean_shift_iterations(X, bw, 1)
        got = mean_shift_step_pallas(X, X, 1.0 / (2 * bw * bw),
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_multi_iteration_matches(self, rng):
        n, d = 512, 128  # aligned case
        x = rng.randn(n, d).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        X = jnp.asarray(x)
        bw = jnp.float32(0.5)
        ref = mean_shift_iterations(X, bw, 4)
        got = mean_shift_iterations_pallas(X, bw, 4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-4, atol=5e-5)

    def test_bf16_dots_preserve_clusters(self, rng):
        # bf16 operands perturb trajectories but not the fixed points:
        # both precisions must land every point on the same mode.
        centers = np.eye(8, dtype=np.float32)[:4]
        x = np.repeat(centers, 60, axis=0)
        x += 0.05 * rng.randn(*x.shape).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        X = jnp.asarray(x)
        f32 = np.asarray(mean_shift_iterations_pallas(
            X, jnp.float32(0.3), 10, interpret=True))
        b16 = np.asarray(mean_shift_iterations_pallas(
            X, jnp.float32(0.3), 10, interpret=True, bf16_dots=True))
        # same mode assignment: nearest converged center agrees pointwise
        lab_f32 = np.argmax(x[:, :4] @ np.eye(4), axis=1)
        for lab in (f32, b16):
            for c in range(4):
                grp = lab[lab_f32 == c]
                assert np.abs(grp - grp[:1]).max() < 2e-2
        np.testing.assert_allclose(b16, f32, rtol=0, atol=2e-2)

    def test_early_exit_tol_matches_full_run(self, rng):
        # tol > 0 stops iterating once the update stalls; the converged
        # result must match the fixed-count run to within the tolerance
        centers = np.eye(8, dtype=np.float32)[:3]
        x = np.repeat(centers, 50, axis=0)
        x += 0.03 * rng.randn(*x.shape).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        X = jnp.asarray(x)
        full = np.asarray(mean_shift_iterations_pallas(
            X, jnp.float32(0.25), 30, interpret=True))
        early = np.asarray(mean_shift_iterations_pallas(
            X, jnp.float32(0.25), 30, interpret=True, tol=1e-6))
        np.testing.assert_allclose(early, full, rtol=0, atol=1e-4)

    def test_clusters_form(self, rng):
        # two tight clusters on the sphere collapse to two centers
        a = np.tile([1, 0, 0, 0, 0, 0, 0, 0], (40, 1))
        b = np.tile([0, 1, 0, 0, 0, 0, 0, 0], (40, 1))
        x = np.concatenate([a, b]).astype(np.float32)
        x += 0.02 * rng.randn(*x.shape).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        out = mean_shift_iterations_pallas(jnp.asarray(x), jnp.float32(0.2),
                                           8, interpret=True)
        out = np.asarray(out)
        assert np.abs(out[:40] - out[:1]).max() < 1e-3
        assert np.abs(out[40:] - out[40:41]).max() < 1e-3
        assert np.abs(out[0] - out[40]).max() > 0.5


class TestAuctionKernel:
    def test_matches_scipy(self, rng):
        from parsenet_tpu.ops.pallas_kernels import auction_assign_pallas
        from parsenet_tpu.ops import hungarian as hg
        for n in (10, 50):
            for t in range(3):
                cost = rng.rand(n, n).astype(np.float32)
                tie = hg._TIE * np.arange(n, dtype=np.float32)[None, :]
                benefit = jnp.asarray(-(cost + tie))
                a = np.asarray(auction_assign_pallas(
                    benefit, hg._EPS0, hg._ESC_EVERY, hg._ESC, 3000,
                    interpret=True))
                assert sorted(a.tolist()) == list(range(n)), "not a perm"
                rid, cid = hg.solve_lap_host(cost)
                # random dense 50x50 instances can run past one or two eps
                # escalations (x8 per 150 rounds), so the optimality bound
                # is n * eps_escalated ~ 4e-3, not n * eps0
                np.testing.assert_allclose(
                    cost[np.arange(n), a].sum(), cost[rid, cid].sum(),
                    atol=5e-3)

    def test_padded_uniform_rows(self, rng):
        """SIOU-structured matrix with empty (uniform) rows through the
        kernel, including the n -> n_pad persons/objects padding."""
        from parsenet_tpu.ops.pallas_kernels import auction_assign_pallas
        from parsenet_tpu.ops import hungarian as hg
        n = 50
        cost = np.ones((n, n), np.float32)
        # 8 real segments with strong diagonal preference, rest uniform
        for i in range(8):
            cost[i, (i * 3) % n] = 0.1 * i / 8.0
        uniform = (cost.max(1) - cost.min(1)) <= 1e-6
        tie = hg._TIE * np.arange(n, dtype=np.float32)[None, :]
        park = hg._BETA * uniform[:, None] * np.eye(n, dtype=np.float32)
        benefit = jnp.asarray(-(cost + tie) + park)
        a = np.asarray(auction_assign_pallas(
            benefit, hg._EPS0, hg._ESC_EVERY, hg._ESC, 3000,
            interpret=True))
        assert sorted(a.tolist()) == list(range(n))
        rid, cid = hg.solve_lap_host(cost)
        np.testing.assert_allclose(cost[np.arange(n), a].sum(),
                                   cost[rid, cid].sum(), atol=2e-3)


class TestMinSqdistKernel:
    def test_matches_xla(self, rng):
        from parsenet_tpu.ops.chamfer import min_sqdist
        from parsenet_tpu.ops.pallas_kernels import min_sqdist_with_idx_pallas
        q = rng.randn(300, 3).astype(np.float32)   # unaligned sizes
        x = rng.randn(1500, 3).astype(np.float32)
        ref = np.asarray(min_sqdist(jnp.asarray(q)[None], jnp.asarray(x)[None]))[0]
        got, idx = min_sqdist_with_idx_pallas(jnp.asarray(q), jnp.asarray(x),
                                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)
        # idx really is the argmin
        d = ((q[:, None] - x[None]) ** 2).sum(-1)
        np.testing.assert_allclose(d[np.arange(300), np.asarray(idx)],
                                   ref, rtol=1e-5, atol=1e-6)

    def test_mask(self, rng):
        from parsenet_tpu.ops.pallas_kernels import min_sqdist_with_idx_pallas
        q = rng.randn(64, 3).astype(np.float32)
        x = np.concatenate([q + 100, q]).astype(np.float32)  # near copies masked off
        mask = np.concatenate([np.ones(64), np.zeros(64)]).astype(np.float32)
        got, idx = min_sqdist_with_idx_pallas(jnp.asarray(q), jnp.asarray(x),
                                              jnp.asarray(mask), interpret=True)
        assert np.asarray(got).min() > 100  # forced to the far (unmasked) half

    def test_gradient_matches_xla(self, rng):
        from parsenet_tpu.ops.pallas_kernels import min_sqdist_fused
        q = jnp.asarray(rng.randn(40, 3).astype(np.float32))
        x = jnp.asarray(rng.randn(90, 3).astype(np.float32))

        def f_pallas(q, x):
            return jnp.sum(min_sqdist_fused(q, x, None, True))

        def f_xla(q, x):
            d = ((q[:, None] - x[None]) ** 2).sum(-1)
            return jnp.sum(jnp.min(d, axis=1))

        gq_p, gx_p = jax.grad(f_pallas, argnums=(0, 1))(q, x)
        gq_x, gx_x = jax.grad(f_xla, argnums=(0, 1))(q, x)
        np.testing.assert_allclose(np.asarray(gq_p), np.asarray(gq_x),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                                   rtol=1e-4, atol=1e-5)
