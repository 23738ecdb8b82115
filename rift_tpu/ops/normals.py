"""On-device surface normal estimation (KNN-PCA).

Open3D-free replacement for the reference's per-pair CPU normal estimation
(`utils/open3d_func.py:77-83`: radius-0.1 KD-tree search, plane fit, orient
towards camera at the origin, normalize). On TPU this is a radius-masked
covariance per point + batched 3×3 eigendecomposition.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .eig3 import smallest_eigenvector_sym3
from .neighbors import grouping, knn

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST


def estimate_normals(points: Array, radius: float = 0.1, max_neighbors: int = 32,
                     camera: Array | None = None) -> Array:
    """Per-point unit normals oriented towards the camera.

    points [..., n, 3] -> normals [..., n, 3].

    The k = max_neighbors nearest points are gathered and masked to the
    radius ball (matching KDTreeSearchParamRadius up to the neighbor cap);
    the normal is the smallest-eigenvector of the masked covariance.
    Orientation: flip so n·(camera - p) >= 0 (Open3D default camera origin).
    """
    d2, idx = knn(points, points, max_neighbors)
    nbr = grouping(points, idx)  # [..., n, k, 3]
    mask = (d2 < radius * radius)[..., None]  # self included (d2 == 0)
    cnt = jnp.maximum(jnp.sum(mask, axis=-2), 1)  # [..., n, 1]
    mean = jnp.sum(jnp.where(mask, nbr, 0.0), axis=-2) / cnt
    centered = jnp.where(mask, nbr - mean[..., None, :], 0.0)
    cov = jnp.einsum("...ki,...kj->...ij", centered, centered, precision=_HI)
    # Degenerate neighborhoods (< 3 points) get the identity added so the
    # solve stays well-conditioned; their normal is arbitrary but finite.
    degenerate = (cnt[..., 0] < 3)[..., None, None]
    cov = jnp.where(degenerate, jnp.eye(3, dtype=points.dtype), cov)
    # Closed-form smallest eigenvector (ops/eig3.py): ~10x cheaper than the
    # general batched eigh on TPU for this [b, n, 3, 3] shape.
    normal = smallest_eigenvector_sym3(cov)
    cam = jnp.zeros(3, points.dtype) if camera is None else camera
    to_cam = cam - points
    sign = jnp.where(jnp.sum(normal * to_cam, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    normal = normal * sign
    return normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
