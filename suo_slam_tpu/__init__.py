"""suo_slam_tpu — a TPU-native (JAX/XLA/Pallas) object-SLAM framework.

A from-scratch rebuild of the capabilities of SUO-SLAM ("Symmetry and
Uncertainty-Aware Object SLAM for 6DoF Object Pose Estimation", CVPR 2022;
reference implementation: rpng/suo_slam) designed TPU-first:

- All per-frame compute (keypoint network, soft-argmax + covariance readout,
  P3P/PnP RANSAC, camera-pose hypothesis voting, and the camera+object
  pose-graph bundle adjustment) runs on-device inside jitted XLA programs
  with static shapes. The reference's Python->C++ boundaries (lambdatwist
  pybind PnP per object, g2o graph building per optimization) are replaced by
  batched, fixed-capacity array programs.
- Training scales over a `jax.sharding.Mesh` with data-parallel pjit
  (the reference's torch.nn.DataParallel equivalent, but over ICI
  collectives instead of single-process CUDA scatter/gather).

Layout (mirrors the layer map of the reference, see SURVEY.md):
  core/      SE(3)/SO(3) Lie math, projective geometry, NDC conventions
  kp/        the 41-keypoint semantic vocabulary + per-object configs
  solvers/   batched P3P (LambdaTwist-style), vectorized PnP RANSAC, LM BA
  models/    Flax stacked-hourglass keypoint network (PkpNet)
  ops/       fused device ops: ROI crop-resize, heatmap rasterization,
             soft-argmax + covariance (Pallas where it pays)
  data/      BOP dataset reader, augmentations, padded batching
  slam/      the ObjectSLAM engine over device-resident graph buffers
  eval/      ADD/ADD-S AUC meters, BOP CSV, evaluation harness
  train/     losses, train loop, orbax checkpointing
  parallel/  mesh + sharding helpers
"""

__version__ = "0.1.0"
