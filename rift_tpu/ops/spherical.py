"""Spherical voxelization (scatter-mean) and spherical trilinear devoxelization.

TPU-native equivalents of the reference CUDA ops `spherical_avg_voxelize`
(`src/spherical_voxelization/spherical_vox.cu:19-163`) and
`spherical_trilinear_devoxelize` (`src/interpolate/spherical_trilinear_devox.cu`),
plus the wrapper `PVCNN/modules/spherical_vox.py:14-23`.

Binning semantics reproduced exactly from `spherical_vox.cu:30-76`:
- γ = ‖p‖ after centering and scaling so the farthest point has γ = 1;
- undefined point -> index -1 when γ == 0 or γ >= 1 (also β >= π, which
  cannot occur for finite inputs);
- β = acos(z/γ) ∈ [0, π);
- α = atan(y/x) + π·(1-sign(x))/2 (so α ∈ (-π/2, 3π/2]), with the x == 0
  special cases, then an azimuth offset α += π/r and a 2π wrap if negative;
- grid = (⌊γ·r⌋, ⌊α·r/2π⌋, ⌊β·r/π⌋) clamped to r-1,
  flat index = gγ·r² + gα·r + gβ.

Devoxelization: the reference CUDA kernel computes its cell corners with
*integer* divisions (`spherical_trilinear_devox.cu:74-76`: `grid_gama / r`
with both ints, so the γ corner is always 0 and the α/β corners are cast
from radian values), which collapses the interpolation onto a handful of
low-index voxels. That is a defect, not a design (see SURVEY.md §7 "known
reference defects"); since this framework re-trains from scratch we implement
the *intended* semantics — proper trilinear interpolation in (γ, α, β) grid
units with periodic wrap in α and boundary clamp in γ/β. Undefined points
(index -1) produce zero output, exactly as the reference masks them.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .voxelize import scatter_mean

Array = jax.Array


def normalize_coords_sphere(coords: Array) -> Array:
    """Center by centroid and scale so the max radius is 1
    (ref: `spherical_vox.py:16-20`). coords [b, n, 3] -> [b, n, 3].

    Note: after this scaling the farthest point has γ exactly 1 and is
    therefore *undefined* under the γ >= 1 rule — faithful to the reference.
    """
    centered = coords - jnp.mean(coords, axis=-2, keepdims=True)
    max_norm = jnp.max(
        jnp.linalg.norm(centered, axis=-1, keepdims=True), axis=-2, keepdims=True
    )
    return centered / (max_norm + 1e-20)


def spherical_coords(norm_coords: Array, resolution: int
                     ) -> tuple[Array, Array, Array, Array]:
    """(γ, α, β, defined-mask) from normalized coords, CUDA-parity rules."""
    r = resolution
    x, y, z = norm_coords[..., 0], norm_coords[..., 1], norm_coords[..., 2]
    gamma = jnp.sqrt(x * x + y * y + z * z)
    # γ >= 1 -> undefined. The boundary is checked with a small margin so the
    # farthest point (γ == 1 after normalization) is undefined on every
    # backend — the exact-1.0 comparison is at the mercy of reciprocal
    # rewrites (x/m vs x*(1/m)) and differed between CPU and TPU.
    defined = (gamma > 0.0) & (gamma < 1.0 - 1e-6)
    safe_gamma = jnp.maximum(gamma, 1e-20)
    beta = jnp.arccos(jnp.clip(z / safe_gamma, -1.0, 1.0))
    defined = defined & (beta < jnp.pi)
    # α per spherical_vox.cu:50-56
    base = jnp.arctan(y / jnp.where(x == 0.0, 1.0, x)) + jnp.pi * (1.0 - jnp.sign(x)) / 2.0
    alpha = jnp.where(
        x == 0.0,
        jnp.where(y != 0.0, jnp.sign(y) * jnp.pi * 0.5, 0.0),
        base,
    )
    alpha = alpha + jnp.pi / r
    alpha = jnp.where(alpha < 0.0, alpha + 2.0 * jnp.pi, alpha)
    return gamma, alpha, beta, defined


def spherical_voxel_indices(norm_coords: Array, resolution: int
                            ) -> tuple[Array, Array]:
    """Flat voxel index per point; undefined points get -1.

    norm_coords [b, n, 3] -> (int32 [b, n], bool defined [b, n]).
    Ref: `spherical_vox.cu:30-76`.
    """
    r = resolution
    gamma, alpha, beta, defined = spherical_coords(norm_coords, r)
    gx = jnp.minimum(jnp.floor(gamma * r).astype(jnp.int32), r - 1)
    gy = jnp.minimum(jnp.floor(alpha * r / (2.0 * jnp.pi)).astype(jnp.int32), r - 1)
    gz = jnp.minimum(jnp.floor(beta * r / jnp.pi).astype(jnp.int32), r - 1)
    gx = jnp.maximum(gx, 0)
    gy = jnp.maximum(gy, 0)
    gz = jnp.maximum(gz, 0)
    ind = gx * (r * r) + gy * r + gz
    return jnp.where(defined, ind, -1), defined


def spherical_avg_voxelize(features: Array, coords: Array, resolution: int
                           ) -> tuple[Array, Array, Array]:
    """Spherical average-pool voxelization.

    features [b, n, c], coords [b, n, 3] (raw; centered/scaled internally) ->
      (voxel grid [b, r, r, r, c] with axes (γ, α, β),
       point->voxel indices int32 [b, n] with -1 for undefined points,
       normalized euclidean coords [b, n, 3]).

    Ref: `PVCNN/modules/spherical_vox.py:14-23` + `spherical_vox.cu`.
    """
    r = resolution
    norm_coords = normalize_coords_sphere(jax.lax.stop_gradient(coords))
    inds, defined = spherical_voxel_indices(norm_coords, r)
    flat = scatter_mean(features, jnp.where(defined, inds, 0), r * r * r,
                        valid=defined)
    grid = flat.reshape(flat.shape[:-2] + (r, r, r, flat.shape[-1]))
    return grid, inds, norm_coords


def spherical_corner_weights(norm_coords: Array, point_inds: Array,
                             resolution: int) -> tuple[Array, Array]:
    """8-corner flat indices + trilinear weights per point.

    norm_coords [..., n, 3], point_inds [..., n] (-1 = undefined) ->
    (idx int32 [..., n, 8] with -1 rows for undefined points,
     w [..., n, 8]). γ/β clamp at the boundary shells; α wraps (periodic).
    """
    r = resolution
    gamma, alpha, beta, _ = spherical_coords(norm_coords, r)
    u = jnp.stack(
        [gamma * r, alpha * r / (2.0 * jnp.pi), beta * r / jnp.pi], axis=-1
    )
    u = jnp.clip(u, 0.0, float(r) - 1e-6)
    lo = jnp.floor(u)
    frac = u - lo
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, r - 1)
    hi_g = jnp.minimum(lo_i[..., 0] + 1, r - 1)
    hi_a = jnp.mod(lo_i[..., 1] + 1, r)
    hi_b = jnp.minimum(lo_i[..., 2] + 1, r - 1)
    idxs, ws = [], []
    for dg in (0, 1):
        wg = frac[..., 0] if dg else (1.0 - frac[..., 0])
        ig = hi_g if dg else lo_i[..., 0]
        for da in (0, 1):
            wa = frac[..., 1] if da else (1.0 - frac[..., 1])
            ia = hi_a if da else lo_i[..., 1]
            for db in (0, 1):
                wb = frac[..., 2] if db else (1.0 - frac[..., 2])
                ib = hi_b if db else lo_i[..., 2]
                idxs.append(ig * (r * r) + ia * r + ib)
                ws.append(wg * wa * wb)
    idx = jnp.stack(idxs, axis=-1)
    w = jnp.stack(ws, axis=-1)
    defined = (point_inds >= 0)[..., None]
    return jnp.where(defined, idx, -1), jnp.where(defined, w, 0.0)


def spherical_trilinear_devoxelize(voxel_grid: Array, norm_coords: Array,
                                   point_inds: Array, resolution: int) -> Array:
    """Trilinear interpolation in (γ, α, β) grid space at each point.

    voxel_grid [b, r, r, r, c], norm_coords [b, n, 3] (normalized euclidean,
    as returned by `spherical_avg_voxelize`), point_inds [b, n] (-1 marks
    undefined points -> zero output). Returns [b, n, c].

    Intended-semantics implementation (see module docstring): grid-unit
    coordinates u = (γ·r, α·r/2π, β·r/π), floor corners, 8-corner weights;
    α wraps periodically (modulo r), γ and β clamp at the boundary shells.
    """
    r = resolution
    c = voxel_grid.shape[-1]
    flat = voxel_grid.reshape(voxel_grid.shape[:-4] + (r * r * r, c))
    gamma, alpha, beta, _ = spherical_coords(norm_coords, r)
    u = jnp.stack(
        [gamma * r, alpha * r / (2.0 * jnp.pi), beta * r / jnp.pi], axis=-1
    )
    u = jnp.clip(u, 0.0, float(r) - 1e-6)
    lo = jnp.floor(u)
    frac = u - lo
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, r - 1)
    hi_g = jnp.minimum(lo_i[..., 0] + 1, r - 1)          # γ: clamp
    hi_a = jnp.mod(lo_i[..., 1] + 1, r)                   # α: periodic wrap
    hi_b = jnp.minimum(lo_i[..., 2] + 1, r - 1)          # β: clamp

    defined = point_inds >= 0
    out = 0.0
    for dg in (0, 1):
        wg = frac[..., 0] if dg else (1.0 - frac[..., 0])
        ig = hi_g if dg else lo_i[..., 0]
        for da in (0, 1):
            wa = frac[..., 1] if da else (1.0 - frac[..., 1])
            ia = hi_a if da else lo_i[..., 1]
            for db in (0, 1):
                wb = frac[..., 2] if db else (1.0 - frac[..., 2])
                ib = hi_b if db else lo_i[..., 2]
                idx = ig * (r * r) + ia * r + ib
                corner = jnp.take_along_axis(flat, idx[..., None], axis=-2)
                out = out + (wg * wa * wb)[..., None] * corner
    return jnp.where(defined[..., None], out, 0.0)
