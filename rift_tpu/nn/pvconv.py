"""PVConv — the dual-branch point-voxel convolution block, plus SE3d.

TPU-native re-design of `PVCNN/modules/pvconv.py:15-99` and
`PVCNN/modules/se.py:6-17`:
- voxel branch: cube or spherical scatter-mean voxelization -> two
  Conv3d(k=3)+BN(eps=1e-4)+LeakyReLU(0.1) (+ optional SE3d) -> trilinear /
  spherical-trilinear devoxelization. Grids are channels-last [b,r,r,r,c]
  so the 3-D convs map straight onto the MXU.
- point branch: 'pointnet_kernel' = SharedMLP on features; 'dgcnn_kernel' =
  edge features against each point's own voxel mean (gathered by the
  voxelization indices; undefined spherical points -> zero edge,
  pvconv.py:68-90), concat [edge, features] -> SharedMLP(2c_in).
- fusion: voxel + point, optionally with a learnable scalar coefficient on
  the voxel branch (pvconv.py:94-98).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pallas.spherical_fast import (
    spherical_avg_voxelize_fast,
    spherical_trilinear_devoxelize_fast,
)
from ..ops.spherical import spherical_avg_voxelize, spherical_trilinear_devoxelize
from ..ops.voxelize import (
    avg_voxelize,
    avg_voxelize_fast,
    trilinear_devoxelize,
    trilinear_devoxelize_fast,
)
from .shared_mlp import SharedMLP


def _use_pallas(impl: str, resolution: int) -> bool:
    """'auto': factorized MXU vox/devox contractions on TPU (see
    ops/factored_vox.py); XLA scatter / row-gather everywhere else (the
    reference path, also the CPU test oracle)."""
    r3 = resolution**3
    if impl == "pallas":
        return r3 % 512 == 0
    if impl == "xla":
        return False
    return jax.default_backend() == "tpu" and r3 % 512 == 0


class SE3d(nn.Module):
    """Squeeze-excitation over a 3-D voxel grid (ref: se.py:6-17),
    channels-last [b, r, r, r, c]; reduction=8."""

    reduction: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        squeezed = jnp.mean(x, axis=(-4, -3, -2))  # [b, c]
        h = nn.Dense(max(c // self.reduction, 1), use_bias=False,
                     dtype=self.dtype)(squeezed)
        h = nn.relu(h)
        h = nn.Dense(c, use_bias=False, dtype=self.dtype)(h)
        gate = nn.sigmoid(h)
        return x * gate[..., None, None, None, :]


class PVConv(nn.Module):
    """One point-voxel conv block.

    __call__(features [b, n, c], coords [b, n, 3], train) -> [b, n, out].
    `coords` are the raw (preprocess-space) coordinates; each block
    re-voxelizes them, so spherical undefined-point indices are identical
    across blocks (ref comment pvconv.py:55-63).
    """

    out_channels: int
    point_kernel_formal: str = "dgcnn_kernel"  # or 'pointnet_kernel'
    voxel_shape: str = "spherical"  # or 'cube'
    resolution: int = 32
    kernel_size: int = 3
    with_coeff: bool = False
    with_se: bool = False
    normalize: bool = True  # cube-path coordinate normalization
    eps: float = 0.0
    impl: str = "auto"  # 'auto' | 'xla' | 'pallas' voxelize/devox backend
    dtype: jnp.dtype | None = None  # compute dtype (bf16 rides the MXU at 2x+)

    @nn.compact
    def __call__(self, features: jnp.ndarray, coords: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        b, n, c = features.shape
        r = self.resolution
        if self.dtype is not None:
            # The whole block computes in `dtype` anyway (convs/MLPs cast
            # their inputs); casting before voxelization lets the one-hot
            # scatter/gather contractions ride the MXU at bf16 rate.
            features = features.astype(self.dtype)

        fast = _use_pallas(self.impl, r)
        if self.voxel_shape == "cube":
            cube_vox = avg_voxelize_fast if fast else avg_voxelize
            grid, inds, grid_coords = cube_vox(
                features, coords, r, normalize=self.normalize, eps=self.eps
            )
        elif self.voxel_shape == "spherical":
            vox = spherical_avg_voxelize_fast if fast else spherical_avg_voxelize
            grid, inds, norm_coords = vox(features, coords, r)
        else:
            raise ValueError(f"unknown voxel_shape {self.voxel_shape!r}")

        # Voxel branch: Conv3d(k)+BN(1e-4)+LeakyReLU(0.1) ×2 (+SE).
        v = grid
        for _ in range(2):
            v = nn.Conv(self.out_channels, (self.kernel_size,) * 3,
                        padding="SAME", dtype=self.dtype)(v)
            v = nn.BatchNorm(use_running_average=not train, epsilon=1e-4,
                             dtype=self.dtype)(v)
            v = nn.leaky_relu(v, negative_slope=0.1)
        if self.with_se:
            v = SE3d(dtype=self.dtype)(v)
        if self.dtype is None:
            v = v.astype(grid.dtype)  # devoxelize in the block's precision

        if self.voxel_shape == "cube":
            cube_devox = (trilinear_devoxelize_fast if fast
                          else trilinear_devoxelize)
            voxel_features = cube_devox(v, grid_coords, r)
        else:
            devox = (spherical_trilinear_devoxelize_fast if fast
                     else spherical_trilinear_devoxelize)
            voxel_features = devox(v, norm_coords, inds, r)

        # Point branch.
        if self.point_kernel_formal == "dgcnn_kernel":
            flat = grid.reshape(b, r * r * r, grid.shape[-1]).astype(features.dtype)
            mask = inds < 0  # undefined spherical points (pvconv.py:73)
            safe_inds = jnp.where(mask, 0, inds)
            center = jnp.take_along_axis(flat, safe_inds[..., None], axis=-2)
            edge = jnp.where(mask[..., None], 0.0, features - center)
            point_in = jnp.concatenate([edge, features], axis=-1)
        elif self.point_kernel_formal == "pointnet_kernel":
            point_in = features
        else:
            raise ValueError(f"unknown point_kernel_formal {self.point_kernel_formal!r}")
        point_features = SharedMLP([self.out_channels],
                                   dtype=self.dtype)(point_in, train=train)

        if self.with_coeff:
            coeff = self.param("coefficient", lambda _: jnp.ones((), jnp.float32))
            return coeff * voxel_features + point_features
        return voxel_features + point_features
