"""rift_tpu — TPU-native point-cloud registration on rotation-invariant features.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
PyTorch/CUDA repo "Point-cloud-registration-based-on-rotation-invariant-feature"
(the `point-cloud-registration-based-on-rotation-invariant-feature_tpu` build):

- rotation-invariant per-point features (PPF, LRF canonicalization, spherical
  voxelization, voxel-neighborhood DGCNN edge conv) on a PVCNN-style backbone,
- ModelNet40 classification under random SO(3),
- two-stage registration: features -> mutual-NN correspondences -> robust pose
  (vectorized RANSAC / GNC-TLS / ICP, all in JAX), RRE/RTE/RMSE evaluation,
- data-parallel training and sharded matching over a `jax.sharding.Mesh`.

Layers (bottom-up): ops -> nn -> models -> data / registration -> parallel -> train.
"""

__version__ = "0.1.0"
