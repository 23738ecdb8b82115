"""PointNet baselines.

TPU-native equivalents of `PVCNN/models/pointnet.py:8-38` (SharedMLP stacks
+ cloud feature) and `PVCNN/models/pointnet_classify.py:50-67` (small
PointNet with optional PCA canonicalization, the reference's pca test rig).
"""
from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.lrf import pca_align
from ..nn.shared_mlp import SharedMLP


class PointNet(nn.Module):
    """Plain SharedMLP feature trunk + cloud feature (ref: pointnet.py:8-38;
    the reference's forward returns the cloud feature)."""

    blocks: Sequence[int] = (64, 64, 64, 128, 1024)
    cloud_features: Sequence[int] = (256, 128)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        point = SharedMLP(list(self.blocks))(x, train=train)
        pooled = jnp.max(point, axis=-2)
        return SharedMLP(list(self.cloud_features))(pooled, train=train)


class PointNetClassifier(nn.Module):
    """Small classification PointNet with optional PCA preprocess
    (ref: pointnet_classify.py:50-67)."""

    mlp: Sequence[int] = (64, 128, 1024)
    num_classes: int = 40
    rot_invariant: str | None = None  # 'pca' or None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.rot_invariant == "pca":
            x = pca_align(x[..., :3])
        h = SharedMLP(list(self.mlp))(x, train=train)
        h = jnp.max(h, axis=-2)
        h = SharedMLP([512])(h, train=train)
        h = nn.Dropout(0.2, deterministic=not train)(h)
        h = SharedMLP([256])(h, train=train)
        return nn.Dense(self.num_classes)(h)
