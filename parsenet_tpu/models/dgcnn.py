"""DGCNN/EdgeConv segmentation network.

TPU-native re-design of reference src/PointNet.py:143-289
(DGCNNEncoderGn + PrimitivesEmbeddingDGCNGn). Identical architecture:

  3 EdgeConvs (64, 64, 128 channels, GroupNorm, LeakyReLU 0.2, k=80) ->
  concat skip 256 -> 1x1 conv 1024 + global max-pool -> broadcast concat ->
  512 -> 256 -> {embedding head 256->128, primitive head 256->10 log-softmax}

TPU-first differences from the reference:
* EdgeConv applies the linear map BEFORE the neighbour gather. Because the
  edge feature is concat(x_j - x_i, x_i) and the conv is 1x1, we split the
  weight W = [W_d | W_x] and compute  W_d x_j + (W_x - W_d) x_i : one [N, C]
  matmul on the MXU plus a gather of the C'-dim outputs, instead of
  materializing the [N, k, 2C] edge tensor and doing an [N*k, 2C] matmul.
  This cuts EdgeConv FLOPs and HBM traffic by ~k/2 (k=80).
* GroupNorm runs over the gathered [N, k, C'] activations exactly like the
  reference (stats over (N, k) per channel group), then LeakyReLU, then
  max over k.
* No Python loops; the kNN graph is built by the chunked ops.knn kernels.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops import knn as knn_ops

Dtype = Any


class _GNParams(nn.Module):
    """Bare GroupNorm scale/bias parameters.

    Named "GroupNorm_0" by the caller so the parameter tree is identical to
    the original `nn.GroupNorm` call — round-1/2 trained checkpoints load
    unchanged into the fused EdgeConv below.
    """
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class EdgeConv(nn.Module):
    """One EdgeConv block: max_j LReLU(GN(W [x_j - x_i; x_i])).

    `dtype` controls the compute/activation dtype (bf16 halves the gather
    traffic and MXU time; GroupNorm statistics stay f32); params are f32.

    The edge nonlinearity never materializes the [B, N, k, C] tensor
    (reference materializes [B, 2C, N, k]: src/PointNet.py:85-103). With
    edge_j = yd_j + yx_i and GroupNorm a per-channel AFFINE map once its
    (batch, group) statistics are known, and LeakyReLU monotone increasing:

        max_j LReLU(a_c * edge_j + b_c)
          = LReLU(a_c * (extreme_j yd_j) + a_c * yx_i + b_c),

    extreme = max when a_c >= 0 else min. The statistics themselves reduce
    to neighbour moments: E[edge] and E[edge^2] expand into neighbour
    sum/sum-of-squares of yd plus closed-form yx terms. So one fused
    gather pass produces four [N, C] reductions (sum, sumsq, max, min) and
    everything else is [N, C] elementwise math — ~k/4 less HBM traffic than
    gather + two-pass GroupNorm + max at k = 80.
    """
    features: int
    groups: int
    negative_slope: float = 0.2
    dtype: Dtype = jnp.float32
    gather_bf16: bool = False  # gather bf16 neighbour values (the random-row
    # gather is HBM-bandwidth-bound at ~5 ms/shape/layer; halving the bytes
    # nearly halves it). Statistics still accumulate in f32; the bf16
    # VALUE rounding perturbs activations ~1e-3 relative — validate quality
    # before enabling.

    @nn.compact
    def __call__(self, x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
        # x: [B, N, C], idx: [B, N, k] -> [B, N, features]
        x = x.astype(self.dtype)
        w_d = nn.Dense(self.features, use_bias=False, name="w_diff",
                       dtype=self.dtype)
        w_x = nn.Dense(self.features, use_bias=False, name="w_center",
                       dtype=self.dtype)
        yd = w_d(x)                       # W_d x  (for gathering as x_j term)
        yx = w_x(x) - yd                  # (W_x - W_d) x_i
        scale, bias = _GNParams(self.features, name="GroupNorm_0")()

        n, k = x.shape[1], idx.shape[2]
        ydf = yd.astype(jnp.float32)
        yxf = yx.astype(jnp.float32)
        # one gather, four fused reductions over the neighbour axis
        gsrc = ydf.astype(jnp.bfloat16) if self.gather_bf16 else ydf
        g = knn_ops.gather_neighbors(gsrc, idx).astype(
            jnp.float32)                                # [B, N, k, C]
        nb_sum = jnp.sum(g, axis=2)
        nb_sq = jnp.sum(g * g, axis=2)
        nb_max = jnp.max(g, axis=2)
        nb_min = jnp.min(g, axis=2)

        # GroupNorm statistics over (N, k, C/G) per (batch, group), exactly
        # as flax GroupNorm computes them on the [B, N, k, C] edge tensor:
        # mean = E[yd_j + yx_i], m2 = E[(yd_j + yx_i)^2] over edges.
        B, C, G = x.shape[0], self.features, self.groups
        e_sum = nb_sum + k * yxf                              # [B, N, C]
        e_sq = nb_sq + 2.0 * yxf * nb_sum + k * yxf * yxf     # [B, N, C]
        denom = n * k * (C // G)
        mean = jnp.sum(e_sum.reshape(B, n, G, C // G), axis=(1, 3)) / denom
        m2 = jnp.sum(e_sq.reshape(B, n, G, C // G), axis=(1, 3)) / denom
        var = m2 - mean * mean
        inv = lax.rsqrt(var + 1e-5)                           # [B, G]
        inv_c = jnp.repeat(inv, C // G, axis=1)               # [B, C]
        mean_c = jnp.repeat(mean, C // G, axis=1)
        a = scale[None, :] * inv_c                            # [B, C]
        b = bias[None, :] - mean_c * a
        # per-channel monotone affine + LReLU: reduce first, activate after
        ext = jnp.where(a[:, None, :] >= 0, nb_max, nb_min) + yxf
        out = nn.leaky_relu(a[:, None, :] * ext + b[:, None, :],
                            self.negative_slope)
        return out.astype(self.dtype)


class DGCNNEncoder(nn.Module):
    """Reference DGCNNEncoderGn (src/PointNet.py:143-220).

    mode=0: xyz input; mode=5: xyz+normals input with the joint
    point/normal kNN metric in the first layer.
    """
    mode: int = 0
    k: int = 80
    dtype: Dtype = jnp.float32
    remat: bool = False  # rematerialize EdgeConvs: trades recompute for the
    # [B, N, k, C] activation memory in the backward pass (large batches)
    gather_bf16: bool = False
    knn_recall: float = 0.0  # approx_max_k recall override for the three
    # graph builds; 0.0 = library env default (0.95). The fast train-step
    # bundle sets 0.85 (quality-gated; the r4 A/B measured <=0.7pt seg IoU
    # across exact->0.85 at EVAL — artifacts/ab_knn_r4.json).

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # x: [B, N, C_in] -> (global [B, 1024], skip [B, N, 256])
        EC = nn.remat(EdgeConv) if self.remat else EdgeConv
        gb = self.gather_bf16
        rc = self.knn_recall
        if self.mode == 5:
            idx = knn_ops.knn_points_normals(x, k1=self.k, k2=self.k,
                                             recall=rc)
        else:
            idx = knn_ops.knn(x, k1=self.k, k2=self.k, recall=rc)
        x1 = EC(64, groups=2, name="conv1", dtype=self.dtype,
                gather_bf16=gb)(x, idx)

        idx = knn_ops.knn(x1, k1=self.k, k2=self.k, recall=rc)
        x2 = EC(64, groups=2, name="conv2", dtype=self.dtype,
                gather_bf16=gb)(x1, idx)

        idx = knn_ops.knn(x2, k1=self.k, k2=self.k, recall=rc)
        x3 = EC(128, groups=2, name="conv3", dtype=self.dtype,
                gather_bf16=gb)(x2, idx)

        feats = jnp.concatenate([x1, x2, x3], axis=-1)  # [B, N, 256]
        h = nn.Dense(1024, name="mlp1", dtype=self.dtype)(feats)
        h = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="bnmlp1",
                         dtype=jnp.float32)(h)
        h = nn.relu(h).astype(self.dtype)
        global_feat = jnp.max(h, axis=1)  # [B, 1024]
        return global_feat, feats


class PrimitivesEmbedding(nn.Module):
    """Reference PrimitivesEmbeddingDGCNGn (src/PointNet.py:223-289).

    Returns (embedding [B, N, emb_size], primitives_log_prob [B, N, P]).
    The embed loss is computed by the caller (losses.embedding) — the
    reference computed it inside forward only to balance DataParallel, which
    pjit makes unnecessary.
    """
    emb_size: int = 128
    num_primitives: int = 10
    mode: int = 0
    k: int = 80
    with_embedding: bool = True
    with_primitives: bool = True
    dtype: Dtype = jnp.float32
    remat: bool = False
    gather_bf16: bool = False
    knn_recall: float = 0.0  # see DGCNNEncoder.knn_recall

    @nn.compact
    def __call__(self, points: jnp.ndarray):
        B, N = points.shape[0], points.shape[1]
        dt = self.dtype
        global_feat, skip = DGCNNEncoder(mode=self.mode, k=self.k,
                                         name="encoder", dtype=dt,
                                         remat=self.remat,
                                         gather_bf16=self.gather_bf16,
                                         knn_recall=self.knn_recall)(points)
        h = jnp.concatenate(
            [jnp.broadcast_to(global_feat[:, None, :], (B, N, 1024)), skip],
            axis=-1)
        h = nn.Dense(512, name="conv1", dtype=dt)(h)
        h = nn.relu(nn.GroupNorm(num_groups=8, epsilon=1e-5, name="bn1",
                                 dtype=jnp.float32)(h)).astype(dt)
        h_all = nn.Dense(256, name="conv2", dtype=dt)(h)
        h_all = nn.relu(nn.GroupNorm(num_groups=4, epsilon=1e-5, name="bn2",
                                     dtype=jnp.float32)(h_all)).astype(dt)

        embedding = None
        prim_log_prob = None
        if self.with_embedding:
            e = nn.Dense(256, name="mlp_seg_prob1", dtype=dt)(h_all)
            e = nn.relu(nn.GroupNorm(num_groups=4, epsilon=1e-5,
                                     name="bn_seg_prob1",
                                     dtype=jnp.float32)(e)).astype(dt)
            embedding = nn.Dense(self.emb_size, name="mlp_seg_prob2",
                                 dtype=dt)(e).astype(jnp.float32)
        if self.with_primitives:
            p = nn.Dense(256, name="mlp_prim_prob1", dtype=dt)(h_all)
            p = nn.relu(nn.GroupNorm(num_groups=4, epsilon=1e-5,
                                     name="bn_prim_prob1",
                                     dtype=jnp.float32)(p)).astype(dt)
            p = nn.Dense(self.num_primitives, name="mlp_prim_prob2",
                         dtype=dt)(p)
            prim_log_prob = jax.nn.log_softmax(
                p.astype(jnp.float32), axis=-1)
        return embedding, prim_log_prob
