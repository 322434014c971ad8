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

from ..ops import knn as knn_ops

Dtype = Any


class EdgeConv(nn.Module):
    """One EdgeConv block: max_j LReLU(GN(W [x_j - x_i; x_i])).

    `dtype` controls the compute/activation dtype (bf16 halves the gather
    traffic and MXU time; GroupNorm statistics stay f32); params are f32.
    """
    features: int
    groups: int
    negative_slope: float = 0.2
    dtype: Dtype = jnp.float32

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
        edge = knn_ops.gather_neighbors(yd, idx) + yx[:, :, None, :]
        edge = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                            dtype=jnp.float32)(edge)
        edge = nn.leaky_relu(edge, self.negative_slope)
        return jnp.max(edge, axis=2).astype(self.dtype)


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

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # x: [B, N, C_in] -> (global [B, 1024], skip [B, N, 256])
        EC = nn.remat(EdgeConv) if self.remat else EdgeConv
        if self.mode == 5:
            idx = knn_ops.knn_points_normals(x, k1=self.k, k2=self.k)
        else:
            idx = knn_ops.knn(x, k1=self.k, k2=self.k)
        x1 = EC(64, groups=2, name="conv1", dtype=self.dtype)(x, idx)

        idx = knn_ops.knn(x1, k1=self.k, k2=self.k)
        x2 = EC(64, groups=2, name="conv2", dtype=self.dtype)(x1, idx)

        idx = knn_ops.knn(x2, k1=self.k, k2=self.k)
        x3 = EC(128, groups=2, name="conv3", dtype=self.dtype)(x2, idx)

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

    @nn.compact
    def __call__(self, points: jnp.ndarray):
        B, N = points.shape[0], points.shape[1]
        dt = self.dtype
        global_feat, skip = DGCNNEncoder(mode=self.mode, k=self.k,
                                         name="encoder", dtype=dt,
                                         remat=self.remat)(points)
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
