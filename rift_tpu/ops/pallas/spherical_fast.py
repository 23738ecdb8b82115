"""Differentiable fast paths for spherical voxelization/devoxelization,
backed by the one-hot MXU kernels (onehot_ops.py).

Forward semantics identical to ops/spherical.py (same binning, same
undefined-point rules); custom VJPs mirror the CUDA backward kernels:
- scatter-mean backward = gather grad_out[ind]/cnt[ind]
  (`spherical_vox.cu:139-163`) — a cheap row gather, done in XLA;
- devoxelize backward = transpose corner scatter
  (`spherical_trilinear_devox.cu:150-194`) — the Pallas scatter kernel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..spherical import (
    normalize_coords_sphere,
    spherical_corner_weights,
    spherical_voxel_indices,
)
from .onehot_ops import (
    corner_gather_pallas,
    corner_scatter_pallas,
    scatter_mean_pallas,
)

Array = jax.Array


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _scatter_mean_diff(features: Array, inds: Array, num_segments: int) -> Array:
    out, _ = scatter_mean_pallas(features, inds, num_segments)
    return out


def _scatter_mean_fwd(features, inds, num_segments):
    out, cnt = scatter_mean_pallas(features, inds, num_segments)
    return out, (inds, cnt, jnp.zeros((0,), features.dtype))


def _scatter_mean_bwd(num_segments, res, g):
    inds, cnt, proto = res
    in_dtype = proto.dtype
    safe = jnp.maximum(inds, 0)
    g_rows = jnp.take_along_axis(g, safe[..., None], axis=-2)
    cnt_rows = jnp.take_along_axis(cnt, safe, axis=-1)
    inv = jnp.where(cnt_rows > 0, 1.0 / jnp.maximum(cnt_rows, 1.0), 0.0)
    dfeat = jnp.where((inds >= 0)[..., None], g_rows * inv[..., None], 0.0)
    return dfeat.astype(in_dtype), None


_scatter_mean_diff.defvjp(_scatter_mean_fwd, _scatter_mean_bwd)


def _corner_gather_xla(grid_flat: Array, idx: Array, w: Array) -> Array:
    """Forward 8-corner weighted gather: XLA's row gather beats the one-hot
    matmul here (only n rows are touched, not the whole grid)."""
    safe = jnp.maximum(idx, 0)
    out = 0.0
    for k in range(8):
        rows = jnp.take_along_axis(grid_flat, safe[..., k:k + 1], axis=-2)
        out = out + w[..., k:k + 1] * rows
    return out


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _corner_gather_diff(grid_flat: Array, idx: Array, w: Array,
                        num_segments: int) -> Array:
    return _corner_gather_xla(grid_flat, idx, w)


def _corner_gather_fwd(grid_flat, idx, w, num_segments):
    return _corner_gather_xla(grid_flat, idx, w), (
        idx, w, jnp.zeros((0,), grid_flat.dtype))


def _corner_gather_bwd(num_segments, res, g):
    idx, w, proto = res
    in_dtype = proto.dtype
    dgrid = corner_scatter_pallas(g.astype(jnp.float32), idx, w, num_segments)
    return dgrid.astype(in_dtype), None, None


_corner_gather_diff.defvjp(_corner_gather_fwd, _corner_gather_bwd)


def spherical_avg_voxelize_fast(features: Array, coords: Array, resolution: int
                                ) -> tuple[Array, Array, Array]:
    """Drop-in for ops.spherical.spherical_avg_voxelize on the MXU path."""
    r = resolution
    norm_coords = normalize_coords_sphere(jax.lax.stop_gradient(coords))
    inds, _ = spherical_voxel_indices(norm_coords, r)
    flat = _scatter_mean_diff(features, inds, r * r * r)
    grid = flat.reshape(flat.shape[:-2] + (r, r, r, flat.shape[-1]))
    return grid, inds, norm_coords


def spherical_trilinear_devoxelize_fast(voxel_grid: Array, norm_coords: Array,
                                        point_inds: Array, resolution: int
                                        ) -> Array:
    """Drop-in for ops.spherical.spherical_trilinear_devoxelize (MXU path)."""
    r = resolution
    c = voxel_grid.shape[-1]
    flat = voxel_grid.reshape(voxel_grid.shape[:-4] + (r * r * r, c))
    idx, w = spherical_corner_weights(
        jax.lax.stop_gradient(norm_coords), point_inds, r
    )
    return _corner_gather_diff(flat, idx, w, r * r * r)
