"""Point-Pair Features (PPF), rotation-invariant 4-d descriptors.

TPU-native formulation of the reference CUDA op `spherical_ppf`
(`PVCNN/modules/functional/src/spherical_ppf/ppf.cu:19-91`) and the torch
local-PPF block (`PVCNN/models/pvcnn_classify.py:252-271`).

Layout convention: channels-last. Points are [..., n, 3].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST

_NORMAL_EPS = 1e-10


def _safe_unit(v: Array, eps: float) -> tuple[Array, Array]:
    """Returns (unit vector, norm). Zero vectors stay zero."""
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    unit = v / jnp.maximum(norm, eps)
    return unit, norm[..., 0]


def ppf(coords: Array, centers: Array, normals: Array, center_normals: Array) -> Array:
    """Pairwise PPF of each point vs its paired center.

    Matches `ppf.cu` semantics: d = center - point; features are
    (∠(d̂, n_center), ∠(d̂, n_point), ∠(n_center, n_point), ‖d‖).
    A point whose normal (or whose center's normal) has norm <= 1e-10 is
    "undefined" and yields an all-zero feature (`ppf.cu:60-69`).

    Args:
      coords:          [..., n, 3] point coordinates.
      centers:         [..., n, 3] paired center coordinates (broadcastable).
      normals:         [..., n, 3] point normals (not necessarily unit).
      center_normals:  [..., n, 3] center normals.

    Returns:
      [..., n, 4] PPF features.
    """
    d = centers - coords
    d_norm = jnp.linalg.norm(d, axis=-1)
    d_unit = d / jnp.maximum(d_norm[..., None], 1e-20)

    n1, n1_norm = _safe_unit(center_normals, _NORMAL_EPS)
    n2, n2_norm = _safe_unit(normals, _NORMAL_EPS)

    def angle(a, b):
        return jnp.arccos(jnp.clip(jnp.sum(a * b, axis=-1), -1.0, 1.0))

    feat = jnp.stack(
        [angle(d_unit, n1), angle(d_unit, n2), angle(n1, n2), d_norm], axis=-1
    )
    defined = (n1_norm > _NORMAL_EPS) & (n2_norm > _NORMAL_EPS)
    return jnp.where(defined[..., None], feat, 0.0)


def global_ppf(coords: Array, normals: Array) -> Array:
    """Global PPF of every point vs the cloud centroid
    (ref: pvcnn_classify.py:99-117 'ppf' preprocess).

    coords/normals: [..., n, 3]. Normals are unit-normalized first
    (pvcnn_classify.py:101). Returns [..., n, 4].
    """
    normals = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12
    )
    centers = jnp.mean(coords, axis=-2, keepdims=True)
    center_normals = jnp.mean(normals, axis=-2, keepdims=True)
    n = coords.shape[-2]
    centers = jnp.broadcast_to(centers, coords.shape)
    center_normals = jnp.broadcast_to(center_normals, normals.shape)
    del n
    return ppf(coords, centers, normals, center_normals)


def local_ppf(neighbor_coords: Array, neighbor_normals: Array,
              center_coords: Array, center_normals: Array) -> Array:
    """Per-neighborhood PPF (ref: pvcnn_classify.py:252-269).

    Args:
      neighbor_coords:  [..., n, k, 3] grouped neighbor coordinates.
      neighbor_normals: [..., n, k, 3].
      center_coords:    [..., n, 3] query centers.
      center_normals:   [..., n, 3].

    Returns [..., n, k, 4]: (∠(n_nbr,d̂), ∠(n_ctr,d̂), ∠(n_nbr,n_ctr), ‖d‖)
    with d = center - neighbor, exactly the reference's channel order
    (nr_d, ni_d, nr_ni, d_norm).
    """
    d = center_coords[..., None, :] - neighbor_coords  # [..., n, k, 3]
    d_norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    d_unit = d / jnp.maximum(d_norm, 1e-20)
    nc = center_normals[..., None, :]

    def angle(a, b):
        return jnp.arccos(jnp.clip(jnp.sum(a * b, axis=-1), -1.0, 1.0))

    return jnp.stack(
        [
            angle(neighbor_normals, d_unit),
            angle(jnp.broadcast_to(nc, d_unit.shape), d_unit),
            angle(neighbor_normals, jnp.broadcast_to(nc, neighbor_normals.shape)),
            d_norm[..., 0],
        ],
        axis=-1,
    )


def new_ppf(coords: Array, normals: Array) -> Array:
    """'new_ppf' preprocess: global PPF + median pairwise azimuth angle α
    (ref: pvcnn_classify.py:121-149). Returns [..., n, 5].

    The O(n²) pairwise angle matrix is expressed as matmuls so XLA maps it
    to the MXU; the median is a sort along the last axis.
    """
    normals = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12
    )
    centers = jnp.mean(coords, axis=-2, keepdims=True)  # [..., 1, 3]
    center_normals = jnp.mean(normals, axis=-2, keepdims=True)
    ncn = center_normals / jnp.maximum(
        jnp.linalg.norm(center_normals, axis=-1, keepdims=True), 1e-12
    )
    old = ppf(
        coords,
        jnp.broadcast_to(centers, coords.shape),
        normals,
        jnp.broadcast_to(center_normals, normals.shape),
    )  # [..., n, 4]

    norm_coords = coords - centers
    # Project onto the plane ⊥ center normal. NOTE (ref parity): the reference
    # multiplies the (coords·n̂) scalar by the *unnormalized* mean normal
    # (pvcnn_classify.py:130); reproduced here.
    proj = norm_coords - jnp.sum(norm_coords * ncn, axis=-1, keepdims=True) * center_normals
    cos_alpha = jnp.einsum("...ic,...jc->...ij", proj, proj, precision=_HI)
    cross = jnp.cross(proj[..., :, None, :], proj[..., None, :, :])
    sin_alpha = jnp.linalg.norm(cross, axis=-1)
    atan_alpha = jnp.arctan2(sin_alpha, cos_alpha)
    atan_alpha = jnp.where(atan_alpha <= 1e-5, 100.0, atan_alpha)
    alpha = jnp.median(atan_alpha, axis=-1)  # [..., n]
    return jnp.concatenate([old, alpha[..., None]], axis=-1)
