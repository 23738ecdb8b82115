"""PointNet++ modules: set abstraction (SA), global abstraction (A), feature
propagation (FP).

TPU-native equivalents of `PVCNN/modules/pointnet.py:11-112`
(PointNetAModule, PointNetSAModule, PointNetFPModule) — present in the
reference's module zoo though not on the main classifier path. Built on the
ops layer: FPS + multi-radius ball grouping + SharedMLP + max-pool, and
3-NN inverse-distance interpolation for FP.
"""
from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.neighbors import ball_group, three_nn_interpolate
from ..ops.sampling import furthest_point_sample, gather
from .shared_mlp import SharedMLP


class PointNetAModule(nn.Module):
    """Global abstraction: MLP on every point (+coords) then max-pool
    (ref: pointnet.py:11-38)."""

    mlp: Sequence[int]
    include_coordinates: bool = True

    @nn.compact
    def __call__(self, features: jnp.ndarray, coords: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        x = (jnp.concatenate([coords, features], axis=-1)
             if self.include_coordinates else features)
        x = SharedMLP(list(self.mlp))(x, train=train)
        return jnp.max(x, axis=-2)


class PointNetSAModule(nn.Module):
    """Set abstraction: FPS centers + per-radius ball grouping + MLP + max
    (ref: pointnet.py:41-80). Multi-scale: one (radius, k, mlp) branch each,
    concatenated."""

    num_centers: int
    radii: Sequence[float]
    num_neighbors: Sequence[int]
    mlps: Sequence[Sequence[int]]
    include_coordinates: bool = True

    @nn.compact
    def __call__(self, features: jnp.ndarray, coords: jnp.ndarray,
                 train: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
        idx = furthest_point_sample(coords, self.num_centers)
        centers = gather(coords, idx)
        outs = []
        for radius, k, mlp in zip(self.radii, self.num_neighbors, self.mlps):
            grouped = ball_group(centers, coords, features, radius, k,
                                 include_coordinates=self.include_coordinates)
            h = SharedMLP(list(mlp))(grouped, train=train)  # [b, m, k, c]
            outs.append(jnp.max(h, axis=-2))
        return jnp.concatenate(outs, axis=-1), centers


class PointNetFPModule(nn.Module):
    """Feature propagation: 3-NN interpolate coarse features onto dense
    points, concat skip features, MLP (ref: pointnet.py:83-112)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, dense_coords: jnp.ndarray, coarse_coords: jnp.ndarray,
                 coarse_features: jnp.ndarray,
                 dense_features: jnp.ndarray | None = None,
                 train: bool = False) -> jnp.ndarray:
        interp = three_nn_interpolate(dense_coords, coarse_coords, coarse_features)
        if dense_features is not None:
            interp = jnp.concatenate([interp, dense_features], axis=-1)
        return SharedMLP(list(self.mlp))(interp, train=train)
