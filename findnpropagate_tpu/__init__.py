"""findnpropagate_tpu — TPU-native open-vocabulary 3D object detection.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the ECCV 2024
"Find n' Propagate" open-vocabulary 3D detection stack (OpenPCDet-based;
reference layout documented in SURVEY.md). The compute path is functional JAX
with static shapes; parallelism is pjit over a `jax.sharding.Mesh`; hot
non-conv kernels (rotated IoU/NMS, points-in-boxes, voxelization) are
implemented as vectorized XLA programs with Pallas variants for the hot path.
"""

__version__ = "0.1.0"
