"""Model forward/backward smoke + shape tests (tiny sizes, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from parsenet_tpu.models.dgcnn import PrimitivesEmbedding, DGCNNEncoder
from parsenet_tpu.models.splinenet import SplineNet


class TestDGCNN:
    def test_shapes_mode0(self, rng):
        model = PrimitivesEmbedding(emb_size=16, num_primitives=10, mode=0, k=8)
        x = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x)
        emb, logp = model.apply(vars_, x)
        assert emb.shape == (2, 64, 16)
        assert logp.shape == (2, 64, 10)
        # log-softmax: logsumexp == 0
        np.testing.assert_allclose(
            np.asarray(jax.scipy.special.logsumexp(logp, axis=-1)), 0.0,
            atol=1e-5)

    def test_shapes_mode5_normals(self, rng):
        model = PrimitivesEmbedding(emb_size=16, num_primitives=10, mode=5, k=8)
        x = jnp.asarray(rng.randn(1, 64, 6).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x)
        emb, logp = model.apply(vars_, x)
        assert emb.shape == (1, 64, 16)

    def test_grad_flows(self, rng):
        model = PrimitivesEmbedding(emb_size=8, num_primitives=10, mode=0, k=4)
        x = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x)

        def loss(params):
            emb, logp = model.apply({"params": params}, x)
            return jnp.sum(emb ** 2) + jnp.sum(logp)

        g = jax.grad(loss)(vars_["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert total > 0

    def test_edgeconv_equivalence(self, rng):
        """The pre-gather matmul trick must equal conv(concat(xj-xi, xi))."""
        from parsenet_tpu.models.dgcnn import EdgeConv
        from parsenet_tpu.ops import knn as knn_ops
        x = jnp.asarray(rng.randn(1, 32, 5).astype(np.float32))
        idx = knn_ops.knn(x, k1=4)
        ec = EdgeConv(8, groups=2)
        vars_ = ec.init(jax.random.PRNGKey(0), x, idx)
        out = ec.apply(vars_, x, idx)
        # manual: build explicit edge features then apply the two weights
        wd = vars_["params"]["w_diff"]["kernel"]
        wx = vars_["params"]["w_center"]["kernel"]
        feats = knn_ops.edge_features(x, idx)  # [1, N, k, 2C]
        manual = feats[..., :5] @ wd + feats[..., 5:] @ wx
        # apply the same GroupNorm + lrelu + max
        import flax.linen as nn
        gn = nn.GroupNorm(num_groups=2, epsilon=1e-5)
        gn_vars = {"params": vars_["params"]["GroupNorm_0"]}
        manual = gn.apply(gn_vars, manual)
        manual = nn.leaky_relu(manual, 0.2)
        manual = jnp.max(manual, axis=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(manual),
                                   rtol=1e-4, atol=1e-5)

    def test_edgeconv_fused_negative_scale_and_grads(self, rng):
        """The fused no-[N,k,C] EdgeConv must equal the materialized
        gather+GroupNorm+LReLU+max formulation, including when GroupNorm
        scales are NEGATIVE (per-channel min instead of max) — and in
        gradients."""
        from parsenet_tpu.models.dgcnn import EdgeConv
        from parsenet_tpu.ops import knn as knn_ops
        import flax.linen as nn
        x = jnp.asarray(rng.randn(2, 48, 6).astype(np.float32))
        idx = knn_ops.knn(x, k1=5)
        ec = EdgeConv(8, groups=2)
        vars_ = ec.init(jax.random.PRNGKey(1), x, idx)
        # randomize GN affine with mixed signs + random biases
        p = jax.tree_util.tree_map(lambda a: a, vars_["params"])
        p["GroupNorm_0"]["scale"] = jnp.asarray(
            rng.randn(8).astype(np.float32))
        p["GroupNorm_0"]["bias"] = jnp.asarray(
            rng.randn(8).astype(np.float32))

        def fused(params):
            return ec.apply({"params": params}, x, idx)

        def manual(params):
            wd, wx = params["w_diff"]["kernel"], params["w_center"]["kernel"]
            feats = knn_ops.edge_features(x, idx)
            edge = feats[..., :6] @ wd + feats[..., 6:] @ wx
            gn = nn.GroupNorm(num_groups=2, epsilon=1e-5)
            edge = gn.apply({"params": params["GroupNorm_0"]}, edge)
            return jnp.max(nn.leaky_relu(edge, 0.2), axis=2)

        np.testing.assert_allclose(np.asarray(fused(p)),
                                   np.asarray(manual(p)),
                                   rtol=1e-4, atol=1e-5)
        gf = jax.grad(lambda q: jnp.sum(jnp.sin(fused(q))))(p)
        gm = jax.grad(lambda q: jnp.sum(jnp.sin(manual(q))))(p)
        for kf, km in zip(jax.tree_util.tree_leaves(gf),
                          jax.tree_util.tree_leaves(gm)):
            np.testing.assert_allclose(np.asarray(kf), np.asarray(km),
                                       rtol=1e-3, atol=1e-4)


class TestEdgeConvBN:
    def test_fused_matches_batchnorm_train_and_eval(self, rng):
        """The fused EdgeConvBN must equal the materialized
        gather + nn.BatchNorm + LReLU + max formulation in BOTH modes,
        including running-average updates and gradients."""
        from parsenet_tpu.models.splinenet import EdgeConvBN
        from parsenet_tpu.ops import knn as knn_ops
        import flax.linen as nn

        x = jnp.asarray(rng.randn(3, 40, 3).astype(np.float32))
        idx = knn_ops.knn(x, k1=4)
        ec = EdgeConvBN(8)
        vars_ = ec.init(jax.random.PRNGKey(0), x, idx, True)
        p = jax.tree_util.tree_map(lambda a: a, vars_["params"])
        p["bn"]["scale"] = jnp.asarray(rng.randn(8).astype(np.float32))
        p["bn"]["bias"] = jnp.asarray(rng.randn(8).astype(np.float32))
        bs = {"bn": {"mean": jnp.asarray(rng.randn(8).astype(np.float32)),
                     "var": jnp.asarray(
                         np.abs(rng.randn(8)).astype(np.float32) + 0.5)}}

        class Manual(nn.Module):
            @nn.compact
            def __call__(self, x, idx, train):
                wd = nn.Dense(8, use_bias=False, name="w_diff")
                wx = nn.Dense(8, use_bias=False, name="w_center")
                yd, yxx = wd(x), wx(x) - wd(x)
                edge = knn_ops.gather_neighbors(yd, idx) + yxx[:, :, None, :]
                edge = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    name="bn")(edge)
                return jnp.max(nn.leaky_relu(edge, 0.2), axis=2)

        man = Manual()
        for train in (False, True):
            out_f, mut_f = ec.apply({"params": p, "batch_stats": bs}, x, idx,
                                    train, mutable=["batch_stats"])
            out_m, mut_m = man.apply({"params": p, "batch_stats": bs}, x,
                                     idx, train, mutable=["batch_stats"])
            np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_m),
                                       rtol=1e-4, atol=1e-5)
            for kf, km in zip(jax.tree_util.tree_leaves(mut_f),
                              jax.tree_util.tree_leaves(mut_m)):
                np.testing.assert_allclose(np.asarray(kf), np.asarray(km),
                                           rtol=1e-4, atol=1e-5)

        def loss_f(q):
            out = ec.apply({"params": q, "batch_stats": bs}, x, idx, True,
                           mutable=["batch_stats"])[0]
            return jnp.sum(jnp.sin(out))

        def loss_m(q):
            out = man.apply({"params": q, "batch_stats": bs}, x, idx, True,
                            mutable=["batch_stats"])[0]
            return jnp.sum(jnp.sin(out))

        gf, gm = jax.grad(loss_f)(p), jax.grad(loss_m)(p)
        for kf, km in zip(jax.tree_util.tree_leaves(gf),
                          jax.tree_util.tree_leaves(gm)):
            np.testing.assert_allclose(np.asarray(kf), np.asarray(km),
                                       rtol=1e-3, atol=1e-4)


class TestSplineNet:
    def test_output_range_and_shape(self, rng):
        model = SplineNet(grid=10, k=4, mode=0)
        x = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(vars_, x, train=False)
        assert out.shape == (2, 100, 3)
        assert float(jnp.max(jnp.abs(out))) <= 1.0  # tanh bounded

    def test_batch_stats_update(self, rng):
        model = SplineNet(grid=10, k=4, mode=0)
        x = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x, train=True)
        out, mut = model.apply(vars_, x, train=True, mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(vars_["batch_stats"])
        after = jax.tree_util.tree_leaves(mut["batch_stats"])
        assert any(not np.allclose(np.asarray(b), np.asarray(a))
                   for b, a in zip(before, after))

    def test_weighted_pool(self, rng):
        """Zero weights on some points must not change output when those
        points' features never win the max (weights mask before pooling)."""
        model = SplineNet(grid=8, k=4, mode=0)
        x = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
        w_all = jnp.ones((1, 64))
        out1 = model.apply(vars_, x, weights=w_all, train=False)
        out2 = model.apply(vars_, x, train=False)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=1e-5)
