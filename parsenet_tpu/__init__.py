"""parsenet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of ParSeNet.

ParSeNet (ECCV 2020, reference: Hippogriff/parsenet-codebase) decomposes a 3D
point cloud into parametric surface patches:

  * a DGCNN/EdgeConv network predicts a per-point embedding + primitive type
    (reference: src/PointNet.py),
  * differentiable mean-shift clustering over the embedding yields segments
    (reference: src/mean_shift.py),
  * each segment is fit with a closed-form geometric primitive
    (plane/sphere/cylinder/cone; reference: src/primitive_forward.py) or a
    neural B-spline patch (SplineNet; reference: src/model.py),
  * trained with triplet-embedding, primitive-classification, spline
    reconstruction and residual losses (reference: src/segment_loss.py,
    src/loss.py, src/primitives.py).

This package is NOT a port: per-shape Python loops and host round-trips in the
reference become fixed-shape masked batch programs compiled once by XLA;
O(N^2) cores (kNN, mean-shift, chamfer) are tiled Pallas TPU kernels; the
fitting stack is vmapped batched linalg; parallelism is pjit over a
`jax.sharding.Mesh` instead of torch DataParallel.

Subpackages
-----------
core      config, numerical guards, RNG, checkpointing, logging
ops       geometry/cluster kernels (kNN, chamfer, mean-shift, B-splines,
          primitive fits & distances, LAP matching, sampling)
models    DGCNN segmentation network, SplineNet control-point decoder
losses    embedding triplet loss, spline losses, residual fitting loss
data      ABC & spline dataset loaders, augmentation, synthetic data
fitting   masked per-segment fitting pipeline (fit_one_shape equivalent)
train     trainers for SplineNet / segmentation / end-to-end
eval      clustering + SIOU + reconstruction metrics pipelines
parallel  device-mesh / sharding helpers
"""

__version__ = "0.1.0"
