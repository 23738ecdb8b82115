"""Cube voxelization (scatter-mean) and trilinear devoxelization.

TPU-native equivalents of the reference CUDA ops `avg_voxelize`
(`src/voxelization/vox.cu:18-111`) and `trilinear_devoxelize`
(`src/interpolate/trilinear_devox.cu:23-135`), plus the normalization wrapper
`PVCNN/modules/voxelization.py:16-35`.

Design notes (TPU-first):
- Scatter-mean is a deterministic XLA scatter-add (`.at[].add`) over a flat
  [r³] segment axis — no atomics; gradients come from JAX AD (gather is the
  transpose of scatter-add), matching the CUDA backward `vox.cu:87-111`
  (grad_y[pos]/cnt gathered back to points) exactly.
- Layout is channels-last: features [b, n, c], grids [b, r, r, r, c].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def normalize_coords_cube(coords: Array, resolution: int, normalize: bool = True,
                          eps: float = 0.0) -> Array:
    """Center + scale coords to continuous voxel space [0, r-1].

    Ref: `voxelization.py:19-29` — center by mean; if normalize, divide by
    (2·max radius + eps) and shift by 0.5; scale by r and clamp to [0, r-1].
    coords: [b, n, 3] -> [b, n, 3] continuous grid coords.
    """
    r = resolution
    centered = coords - jnp.mean(coords, axis=-2, keepdims=True)
    if normalize:
        max_norm = jnp.max(
            jnp.linalg.norm(centered, axis=-1, keepdims=True), axis=-2, keepdims=True
        )
        norm_coords = centered / (max_norm * 2.0 + eps) + 0.5
    else:
        norm_coords = (centered + 1.0) / 2.0
    return jnp.clip(norm_coords * r, 0.0, r - 1.0)


def cube_voxel_indices(grid_coords: Array, resolution: int) -> Array:
    """Round continuous grid coords to flat voxel indices.

    Ref: `voxelization.py:30` (round) + `vox.cu:31` (ind = x·r² + y·r + z).
    grid_coords: [b, n, 3] in [0, r-1] -> int32 [b, n] in [0, r³).
    """
    r = resolution
    v = jnp.clip(jnp.round(grid_coords).astype(jnp.int32), 0, r - 1)
    return v[..., 0] * (r * r) + v[..., 1] * r + v[..., 2]


def scatter_mean(features: Array, indices: Array, num_segments: int,
                 valid: Array | None = None) -> Array:
    """Deterministic scatter-mean of features into `num_segments` slots.

    features: [b, n, c]; indices: int [b, n]; valid: optional bool [b, n]
    (False rows are dropped — the spherical "undefined point" rule,
    `spherical_vox.cu:103-105`). Returns [b, num_segments, c].

    Matches `vox.cu` forward: out[pos] = Σ feat[i]/cnt[pos]; the count is a
    non-differentiable integer, so gradients flow only through the features
    (CUDA backward `vox.cu:87-111` parity).
    """
    if valid is None:
        valid = jnp.ones(indices.shape, dtype=bool)
    # Route dropped points to an extra trash slot.
    idx = jnp.where(valid, indices, num_segments)
    ones = valid.astype(features.dtype)
    cnt = jnp.zeros(features.shape[:-2] + (num_segments + 1,), features.dtype)
    cnt = _batched_add(cnt, idx, ones)
    inv_cnt = jnp.where(cnt > 0, 1.0 / jnp.maximum(cnt, 1.0), 0.0)
    inv_cnt = jax.lax.stop_gradient(inv_cnt)
    weighted = features * jnp.take_along_axis(inv_cnt, idx, axis=-1)[..., None]
    weighted = jnp.where(valid[..., None], weighted, 0.0)
    out = jnp.zeros(features.shape[:-2] + (num_segments + 1, features.shape[-1]),
                    features.dtype)
    out = _batched_add_vec(out, idx, weighted)
    return out[..., :num_segments, :]


def _batched_add(buf: Array, idx: Array, vals: Array) -> Array:
    """buf[..., s] += vals at idx along the last axis, batched."""
    def one(b, i, v):
        return b.at[i].add(v)
    for _ in range(idx.ndim - 1):
        one = jax.vmap(one)
    return one(buf, idx, vals)


def _batched_add_vec(buf: Array, idx: Array, vals: Array) -> Array:
    """buf[..., s, c] += vals[..., n, c] scattered by idx[..., n]."""
    def one(b, i, v):
        return b.at[i].add(v)
    for _ in range(idx.ndim - 1):
        one = jax.vmap(one)
    return one(buf, idx, vals)


def avg_voxelize(features: Array, coords: Array, resolution: int,
                 normalize: bool = True, eps: float = 0.0
                 ) -> tuple[Array, Array, Array]:
    """Cube average-pool voxelization.

    features [b, n, c], coords [b, n, 3] ->
      (voxel grid [b, r, r, r, c], point->voxel indices int32 [b, n],
       continuous grid coords [b, n, 3] in [0, r-1]).

    Ref: `PVCNN/modules/voxelization.py:16-35` + `vox.cu`. Coordinates are
    detached (stop_gradient), as in the reference.
    """
    r = resolution
    grid_coords = normalize_coords_cube(jax.lax.stop_gradient(coords), r,
                                        normalize=normalize, eps=eps)
    inds = cube_voxel_indices(grid_coords, r)
    flat = scatter_mean(features, inds, r * r * r)
    grid = flat.reshape(flat.shape[:-2] + (r, r, r, flat.shape[-1]))
    return grid, inds, grid_coords


def trilinear_devoxelize(voxel_grid: Array, grid_coords: Array, resolution: int
                         ) -> Array:
    """Trilinear interpolation of voxel features at continuous grid coords.

    voxel_grid [b, r, r, r, c], grid_coords [b, n, 3] in [0, r-1] ->
    [b, n, c].

    Ref: `trilinear_devox.cu:23-135` — floor-based 8-corner interpolation;
    because coords are clamped to [0, r-1], the +1 corners never leave the
    grid when the fraction is nonzero. The backward (scatter-add of weighted
    grads, `trilinear_devox.cu` grad kernel) falls out of JAX AD as the
    gather transpose.
    """
    r = resolution
    c = voxel_grid.shape[-1]
    flat = voxel_grid.reshape(voxel_grid.shape[:-4] + (r * r * r, c))
    lo = jnp.floor(grid_coords)
    frac = grid_coords - lo
    lo_i = lo.astype(jnp.int32)
    # hi offset exists only when frac > 0 (exactly the CUDA bit-trick
    # `(x_hi & r2)` semantics): lo==r-1 implies frac==0, so hi==lo is safe.
    hi_i = jnp.minimum(lo_i + (frac > 0).astype(jnp.int32), r - 1)

    out = 0.0
    for dx in (0, 1):
        wx = frac[..., 0] if dx else (1.0 - frac[..., 0])
        ix = hi_i[..., 0] if dx else lo_i[..., 0]
        for dy in (0, 1):
            wy = frac[..., 1] if dy else (1.0 - frac[..., 1])
            iy = hi_i[..., 1] if dy else lo_i[..., 1]
            for dz in (0, 1):
                wz = frac[..., 2] if dz else (1.0 - frac[..., 2])
                iz = hi_i[..., 2] if dz else lo_i[..., 2]
                idx = ix * (r * r) + iy * r + iz
                corner = jnp.take_along_axis(flat, idx[..., None], axis=-2)
                out = out + (wx * wy * wz)[..., None] * corner
    return out


# ------------------------------------------------------------------ #
# Factorized fast path (round 5) — same semantics, MXU contractions with
# factorized selectors instead of XLA scatter / 8-row gather. See
# ops/factored_vox.py for the formulation.


def cube_weight_planes(grid_coords: Array, resolution: int
                       ) -> tuple[Array, Array]:
    """Factorized trilinear selectors for the cube grid.

    grid_coords [b, n, 3] continuous in [0, r-1] ->
      (w_hi [b, n, r²] over (x, y), w_lo [b, n, r] over z). All axes clamp
    at the boundary; weight-0 hi corners make the `(frac > 0)` hi rule of
    `trilinear_devoxelize` numerically irrelevant (`trilinear_devox.cu`
    bit-trick parity).
    """
    from .factored_vox import axis_weight_plane, combine_hi_planes

    r = resolution
    lo = jnp.floor(grid_coords)
    frac = (grid_coords - lo).astype(jnp.float32)
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, r - 1)
    hi_i = jnp.minimum(lo_i + 1, r - 1)
    p_x = axis_weight_plane(lo_i[..., 0], hi_i[..., 0], frac[..., 0], r)
    p_y = axis_weight_plane(lo_i[..., 1], hi_i[..., 1], frac[..., 1], r)
    p_z = axis_weight_plane(lo_i[..., 2], hi_i[..., 2], frac[..., 2], r)
    return combine_hi_planes(p_x, p_y), p_z


def avg_voxelize_fast(features: Array, coords: Array, resolution: int,
                      normalize: bool = True, eps: float = 0.0
                      ) -> tuple[Array, Array, Array]:
    """Drop-in for avg_voxelize on the factorized MXU path."""
    from .factored_vox import scatter_mean_diff

    r = resolution
    grid_coords = normalize_coords_cube(jax.lax.stop_gradient(coords), r,
                                        normalize=normalize, eps=eps)
    inds = cube_voxel_indices(grid_coords, r)
    flat = scatter_mean_diff(features, inds, r)
    grid = flat.reshape(flat.shape[:-2] + (r, r, r, flat.shape[-1]))
    return grid, inds, grid_coords


def trilinear_devoxelize_fast(voxel_grid: Array, grid_coords: Array,
                              resolution: int) -> Array:
    """Drop-in for trilinear_devoxelize on the factorized MXU path."""
    from .factored_vox import corner_gather_diff

    r = resolution
    c = voxel_grid.shape[-1]
    flat = voxel_grid.reshape(voxel_grid.shape[:-4] + (r * r * r, c))
    w_hi, w_lo = cube_weight_planes(jax.lax.stop_gradient(grid_coords), r)
    return corner_gather_diff(flat, w_hi, w_lo, r)
