"""TPU-native dense SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DenseSLAM-Global-Consistency-h (sparse keyframe odometry + voxel-hashed TSDF
fusion with raycasting, voxel decay, sliding-window culling, and online
de-integration/re-integration for global consistency), architected as
fixed-shape jit-compiled device programs over `jax.sharding.Mesh`.

Layer map (mirrors SURVEY.md section 1, rebuilt TPU-first):
  models/   — pipeline orchestrator (DenseSlam equivalent), frontend, backend
  ops/      — device kernels: hash table, TSDF, raycast, ICP, features,
              matching, stereo, RANSAC/GN, BA, pose graph, meshing
  parallel/ — device mesh + shard_map sharding of the voxel block table
  io/       — dataset readers (KITTI/TUM/ICL-NUIM), depth providers, PFM,
              trajectory writers
  eval/     — depth-quality and trajectory metrics
  utils/    — Lie groups, camera models, image ops, timers
"""

__version__ = "0.1.0"

import jax as _jax

# SLAM numerics need real f32 matmuls: pose compositions, GN/Schur normal
# equations, ICP reductions and RANSAC refits are all small MXU
# contractions whose bf16 default (TPU Precision.DEFAULT) costs ~8 mantissa
# bits exactly where conditioning is worst (the reference solves these in
# f64, src/libviso2/src/matrix.h:44-45). Every matmul in this framework is
# tiny next to the gather/DMA-bound map ops, so "highest" is effectively
# free here. Opt-outs are per-op (precision=... at the call site).
_jax.config.update("jax_default_matmul_precision", "highest")
