"""TPU-native GlORIE-SLAM: monocular dense neural SLAM on JAX/XLA/Pallas.

A from-scratch rebuild of the capabilities of GlORIE-SLAM
(zhangganlin/GlORIE-SLAM, arXiv:2403.19549) designed for TPU:

- DROID-style learned tracker (flax CNN encoders + ConvGRU update) with
  correlation-volume lookup expressed as separable matmuls on the MXU.
- Dense bundle adjustment (DBA) and the DSPO layer (disparity/scale/pose
  optimization) as batched Gauss-Newton with a Schur complement, built from
  fixed-shape XLA linear algebra instead of CUDA kernels + Eigen sparse CPU
  solves.
- GO-SLAM-style global backend with loop closure, online and final global BA.
- Point-SLAM-style deformable neural point cloud mapper with MLP decoders and
  depth-guided volume rendering.

Reference parity is documented per-module via file:line citations into
/root/reference (the PyTorch/CUDA implementation).
"""

__version__ = "0.1.0"
