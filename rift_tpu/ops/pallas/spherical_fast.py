"""Differentiable fast paths for spherical voxelization/devoxelization.

Round 5: backed by the *factorized* selectors (ops/factored_vox.py) — the
r³ one-hot splits into an (r²-hi ⊗ r-lo) pair and trilinear weights
separate per axis, so scatter/gather are dense MXU matmuls with ~30× less
VPU selector work than the one-hot kernels (which remain available via
RIFT_FACTORED_VOX=0 for A/B; the toggle is read at import,
process-start-only).

Forward semantics identical to ops/spherical.py (same binning, same
undefined-point rules, oracle-tested); custom VJPs mirror the CUDA
backward kernels:
- scatter-mean backward = gather grad_out[ind]/cnt[ind]
  (`spherical_vox.cu:139-163`) — a cheap row gather;
- devoxelize backward = transpose corner scatter
  (`spherical_trilinear_devox.cu:150-194`) — factorized matmuls.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from ..factored_vox import (
    axis_weight_plane,
    combine_hi_planes,
    corner_gather_diff,
    scatter_mean_diff,
)
from ..spherical import (
    normalize_coords_sphere,
    spherical_coords,
    spherical_corner_weights,
    spherical_voxel_indices,
)
from .onehot_ops import (
    corner_scatter_pallas,
    scatter_mean_pallas,
)

Array = jax.Array

_FACTORED = os.environ.get("RIFT_FACTORED_VOX", "1") != "0"


def spherical_weight_planes(norm_coords: Array, point_inds: Array,
                            resolution: int) -> tuple[Array, Array]:
    """Factorized trilinear selectors for the spherical grid.

    norm_coords [b, n, 3] (normalized euclidean), point_inds [b, n]
    (-1 = undefined -> zero rows) ->
      (w_hi [b, n, r²] over the (γ, α) plane, w_lo [b, n, r] over β).
    γ/β clamp at boundary shells; α wraps (periodic) — identical corner
    rules to spherical_corner_weights (whose 8-corner expansion this
    product form equals exactly).
    """
    r = resolution
    gamma, alpha, beta, _ = spherical_coords(norm_coords, r)
    u = jnp.stack(
        [gamma * r, alpha * r / (2.0 * jnp.pi), beta * r / jnp.pi], axis=-1
    )
    u = jnp.clip(u, 0.0, float(r) - 1e-6)
    lo = jnp.floor(u)
    frac = (u - lo).astype(jnp.float32)
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, r - 1)
    hi_g = jnp.minimum(lo_i[..., 0] + 1, r - 1)           # γ: clamp
    hi_a = jnp.mod(lo_i[..., 1] + 1, r)                   # α: periodic wrap
    hi_b = jnp.minimum(lo_i[..., 2] + 1, r - 1)           # β: clamp
    valid = point_inds >= 0
    p_g = axis_weight_plane(lo_i[..., 0], hi_g, frac[..., 0], r, valid)
    p_a = axis_weight_plane(lo_i[..., 1], hi_a, frac[..., 1], r)
    p_b = axis_weight_plane(lo_i[..., 2], hi_b, frac[..., 2], r)
    return combine_hi_planes(p_g, p_a), p_b


# ------------------------------------------------------------------ #
# Pre-round-5 one-hot path, kept for RIFT_FACTORED_VOX=0 A/B runs.


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _scatter_mean_onehot_diff(features: Array, inds: Array,
                              num_segments: int) -> Array:
    out, _ = scatter_mean_pallas(features, inds, num_segments)
    return out


def _scatter_mean_onehot_fwd(features, inds, num_segments):
    out, cnt = scatter_mean_pallas(features, inds, num_segments)
    return out, (inds, cnt, jnp.zeros((0,), features.dtype))


def _scatter_mean_onehot_bwd(num_segments, res, g):
    inds, cnt, proto = res
    safe = jnp.maximum(inds, 0)
    g_rows = jnp.take_along_axis(g, safe[..., None], axis=-2)
    cnt_rows = jnp.take_along_axis(cnt, safe, axis=-1)
    inv = jnp.where(cnt_rows > 0, 1.0 / jnp.maximum(cnt_rows, 1.0), 0.0)
    dfeat = jnp.where((inds >= 0)[..., None], g_rows * inv[..., None], 0.0)
    return dfeat.astype(proto.dtype), None


_scatter_mean_onehot_diff.defvjp(_scatter_mean_onehot_fwd,
                                 _scatter_mean_onehot_bwd)


def _corner_gather_xla(grid_flat: Array, idx: Array, w: Array) -> Array:
    """8-corner weighted row gather (pre-round-5 forward)."""
    safe = jnp.maximum(idx, 0)
    out = 0.0
    for k in range(8):
        rows = jnp.take_along_axis(grid_flat, safe[..., k:k + 1], axis=-2)
        out = out + w[..., k:k + 1] * rows
    return out


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _corner_gather_onehot_diff(grid_flat: Array, idx: Array, w: Array,
                               num_segments: int) -> Array:
    return _corner_gather_xla(grid_flat, idx, w)


def _corner_gather_onehot_fwd(grid_flat, idx, w, num_segments):
    return _corner_gather_xla(grid_flat, idx, w), (
        idx, w, jnp.zeros((0,), grid_flat.dtype))


def _corner_gather_onehot_bwd(num_segments, res, g):
    idx, w, proto = res
    dgrid = corner_scatter_pallas(g.astype(jnp.float32), idx, w, num_segments)
    return dgrid.astype(proto.dtype), None, None


_corner_gather_onehot_diff.defvjp(_corner_gather_onehot_fwd,
                                  _corner_gather_onehot_bwd)


# ------------------------------------------------------------------ #
# Public drop-ins (used by nn/pvconv.py on the fast path).


def spherical_avg_voxelize_fast(features: Array, coords: Array, resolution: int
                                ) -> tuple[Array, Array, Array]:
    """Drop-in for ops.spherical.spherical_avg_voxelize on the MXU path."""
    r = resolution
    norm_coords = normalize_coords_sphere(jax.lax.stop_gradient(coords))
    inds, _ = spherical_voxel_indices(norm_coords, r)
    if _FACTORED:
        flat = scatter_mean_diff(features, inds, r)
    else:
        flat = _scatter_mean_onehot_diff(features, inds, r * r * r)
    grid = flat.reshape(flat.shape[:-2] + (r, r, r, flat.shape[-1]))
    return grid, inds, norm_coords


def spherical_trilinear_devoxelize_fast(voxel_grid: Array, norm_coords: Array,
                                        point_inds: Array, resolution: int
                                        ) -> Array:
    """Drop-in for ops.spherical.spherical_trilinear_devoxelize (MXU path)."""
    r = resolution
    c = voxel_grid.shape[-1]
    flat = voxel_grid.reshape(voxel_grid.shape[:-4] + (r * r * r, c))
    if _FACTORED:
        w_hi, w_lo = spherical_weight_planes(
            jax.lax.stop_gradient(norm_coords), point_inds, r
        )
        return corner_gather_diff(flat, w_hi, w_lo, r)
    idx, w = spherical_corner_weights(
        jax.lax.stop_gradient(norm_coords), point_inds, r
    )
    return _corner_gather_onehot_diff(flat, idx, w, r * r * r)
