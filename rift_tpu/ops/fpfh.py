"""Fast Point Feature Histograms (FPFH) — on-device, Open3D-free.

Replaces the reference's per-sample CPU call to
`o3d.pipelines.registration.compute_fpfh_feature` (used by the
`with_local_feat='fpfh'` model option, `pvcnn_classify.py:272-285`).

Standard FPFH (Rusu et al., ICRA'09): per point, the SPFH is three 11-bin
histograms of the Darboux-frame angles (α, φ, θ) against its radius
neighbors; FPFH(p) = SPFH(p) + (1/k)·Σ_q SPFH(q)/‖p-q‖, concatenated to a
33-d descriptor, L1-normalized per sub-histogram (×100, Open3D convention).
On TPU: fixed-k neighbor gathers, one-hot histogram accumulation (matmul),
no KD-tree.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .neighbors import grouping, knn

Array = jax.Array

_BINS = 11


def _histogram(values: Array, lo: float, hi: float, mask: Array) -> Array:
    """Masked SOFT histogram over the last axis -> [..., _BINS].

    Weight is split linearly between the two nearest bin centers: bin-edge
    jitter (e.g. from rotating the frame) moves mass smoothly instead of
    flipping whole bins, keeping the descriptor rotation-stable.
    """
    pos = jnp.clip((values - lo) / (hi - lo) * _BINS - 0.5, 0.0, _BINS - 1.0)
    lo_bin = jnp.floor(pos)
    frac = pos - lo_bin
    lo_oh = jax.nn.one_hot(lo_bin.astype(jnp.int32), _BINS, dtype=values.dtype)
    hi_oh = jax.nn.one_hot(
        jnp.minimum(lo_bin + 1, _BINS - 1).astype(jnp.int32), _BINS,
        dtype=values.dtype,
    )
    onehot = lo_oh * (1.0 - frac[..., None]) + hi_oh * frac[..., None]
    onehot = jnp.where(mask[..., None], onehot, 0.0)
    return jnp.sum(onehot, axis=-2)


def _spfh(points: Array, normals: Array, nbr_idx: Array, nbr_mask: Array) -> Array:
    """Simplified PFH per point: [..., n, 33]."""
    p = points[..., :, None, :]                     # [..., n, 1, 3]
    q = grouping(points, nbr_idx)                   # [..., n, k, 3]
    nq = grouping(normals, nbr_idx)
    np_ = normals[..., :, None, :]
    d = q - p
    dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
    du = d / jnp.maximum(dist, 1e-12)
    u = jnp.broadcast_to(np_, du.shape)
    v = jnp.cross(du, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    w = jnp.cross(u, v)
    alpha = jnp.sum(v * nq, axis=-1)                          # [-1, 1]
    phi = jnp.sum(u * du, axis=-1)                            # [-1, 1]
    theta = jnp.arctan2(jnp.sum(w * nq, axis=-1), jnp.sum(u * nq, axis=-1))
    h = jnp.concatenate(
        [
            _histogram(alpha, -1.0, 1.0, nbr_mask),
            _histogram(phi, -1.0, 1.0, nbr_mask),
            _histogram(theta, -jnp.pi, jnp.pi, nbr_mask),
        ],
        axis=-1,
    )
    return h


def fpfh(points: Array, normals: Array, radius: float = 0.3,
         max_neighbors: int = 64) -> Array:
    """FPFH descriptors.

    points/normals [..., n, 3] -> [..., n, 33].
    """
    d2, idx = knn(points, points, max_neighbors)
    mask = (d2 < radius * radius) & (d2 > 1e-12)  # exclude self
    spfh = _spfh(points, normals, idx, mask)      # [..., n, 33]
    # Weighted neighbor sum: FPFH = SPFH + (1/k)·Σ SPFH(q)/dist(q)
    nbr_spfh = grouping(spfh, idx)                # [..., n, k, 33]
    wgt = jnp.where(mask, 1.0 / jnp.sqrt(jnp.maximum(d2, 1e-12)), 0.0)
    k_eff = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1.0)
    neigh = jnp.sum(nbr_spfh * wgt[..., None], axis=-2) / k_eff
    out = spfh + neigh
    # L1-normalize each 11-bin sub-histogram to 100 (Open3D convention).
    parts = []
    for i in range(3):
        sub = out[..., i * _BINS:(i + 1) * _BINS]
        parts.append(100.0 * sub / jnp.maximum(
            jnp.sum(sub, axis=-1, keepdims=True), 1e-12))
    return jnp.concatenate(parts, axis=-1)
