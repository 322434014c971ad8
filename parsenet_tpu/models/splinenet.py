"""SplineNet — control-point prediction decoder.

TPU-native re-design of reference src/model.py:56-180 (DGCNNControlPoints):
4 EdgeConvs (mode 0: 64/64/128/256; mode 1 "closed": 128/256/256/512, k=10),
BatchNorm + LeakyReLU(0.2), concat skips -> 1x1 conv 1024 -> optional
per-point weight multiply -> global max pool -> MLP 1024 -> 1024 ->
3*grid^2 -> tanh -> [B, grid^2, 3] control grid.

BatchNorm is kept (reference uses it here, unlike the GroupNorm seg net);
under pjit the batch statistics are computed over the *global* sharded batch
automatically — XLA inserts the cross-ICI reductions — so no DataParallel
special-casing is needed. EdgeConv uses the same pre-gather matmul trick as
models.dgcnn.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import knn as knn_ops


class _BNVars(nn.Module):
    """BatchNorm parameters + running statistics with flax's exact variable
    naming (params: scale/bias; batch_stats: mean/var), so checkpoints
    trained against `nn.BatchNorm` load unchanged into the fused EdgeConv."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,)))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,)))
        return scale, bias, mean, var


class EdgeConvBN(nn.Module):
    """EdgeConv + BatchNorm + LReLU + max over neighbours, fused.

    Like models.dgcnn.EdgeConv, the [B, N, k, C] edge tensor is never
    materialized: BatchNorm is a per-channel affine map once its statistics
    are known (running averages at eval; batch moments at train, which
    expand into neighbour sum/sum-of-squares), and LeakyReLU is monotone,
    so max_j LReLU(BN(yd_j + yx_i)) reduces to per-channel neighbour
    max/min selected by the sign of the BN scale.
    """
    features: int
    negative_slope: float = 0.2
    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, idx: jnp.ndarray, train: bool) -> jnp.ndarray:
        w_d = nn.Dense(self.features, use_bias=False, name="w_diff")
        w_x = nn.Dense(self.features, use_bias=False, name="w_center")
        yd = w_d(x)
        yx = w_x(x) - yd
        scale, bias, ra_mean, ra_var = _BNVars(self.features, name="bn")()

        Bn, N, k = x.shape[0], x.shape[1], idx.shape[2]
        g = knn_ops.gather_neighbors(yd, idx)           # [B, N, k, C]
        nb_sum = jnp.sum(g, axis=2)
        nb_max = jnp.max(g, axis=2)
        nb_min = jnp.min(g, axis=2)

        if train:
            nb_sq = jnp.sum(g * g, axis=2)
            e_sum = nb_sum + k * yx
            e_sq = nb_sq + 2.0 * yx * nb_sum + k * yx * yx
            cnt = Bn * N * k
            mean = jnp.sum(e_sum, axis=(0, 1)) / cnt
            var = jnp.sum(e_sq, axis=(0, 1)) / cnt - mean * mean
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value

        a = scale * jax.lax.rsqrt(var + self.eps)       # [C]
        b = bias - mean * a
        ext = jnp.where(a[None, None, :] >= 0, nb_max, nb_min) + yx
        return nn.leaky_relu(a[None, None, :] * ext + b[None, None, :],
                             self.negative_slope)


class SplineNet(nn.Module):
    """DGCNNControlPoints equivalent. grid = control-grid side (20)."""
    grid: int = 20
    k: int = 10
    mode: int = 0  # 0: open-spline sizes, 1: closed-spline sizes

    @nn.compact
    def __call__(self, points: jnp.ndarray,
                 weights: Optional[jnp.ndarray] = None,
                 train: bool = True) -> jnp.ndarray:
        # points: [B, N, 3]; weights: [B, N] per-point confidence or None.
        chans = (64, 64, 128, 256) if self.mode == 0 else (128, 256, 256, 512)
        B = points.shape[0]
        x = points
        skips = []
        for li, c in enumerate(chans):
            idx = knn_ops.knn(x, k1=self.k, k2=self.k)
            x = EdgeConvBN(c, name=f"conv{li + 1}")(x, idx, train)
            skips.append(x)
        h = jnp.concatenate(skips, axis=-1)
        h = nn.Dense(1024, use_bias=False, name="conv5")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn5")(h)
        h = nn.leaky_relu(h, 0.2)
        if weights is not None:
            # weighted max-pool: soft membership focuses the global feature
            # on the segment (reference: src/model.py:165-167)
            h = h * weights[:, :, None]
        g = jnp.max(h, axis=1)  # [B, 1024]
        g = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name="bn6")(
            nn.Dense(1024, name="conv6")(g)))
        g = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name="bn7")(
            nn.Dense(1024, name="conv7")(g)))
        out = nn.tanh(nn.Dense(3 * self.grid * self.grid, name="conv8")(g))
        return out.reshape(B, self.grid * self.grid, 3)
