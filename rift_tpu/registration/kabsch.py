"""Weighted Kabsch/Umeyama rigid alignment — the inner solver shared by
RANSAC, GNC and ICP.

The reference delegates this to Open3D's TransformationEstimationPointToPoint
(`utils/open3d_func.py:43-47`); here it is a batched 3×3 SVD, vmappable and
differentiable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST


def weighted_kabsch(src: Array, dst: Array, weights: Array | None = None) -> Array:
    """Best-fit SE(3) transform T with T·src ≈ dst (row-vector points).

    src/dst [..., n, 3], weights [..., n] (>= 0) -> [..., 4, 4].
    Zero total weight returns identity.
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-12)
    cs = jnp.sum(src * w, axis=-2, keepdims=True) / wsum
    cd = jnp.sum(dst * w, axis=-2, keepdims=True) / wsum
    s = src - cs
    d = dst - cd
    # H = Σᵢ wᵢ·sᵢ⊗dᵢ; R = V·diag(1,1,det(VUᵀ))·Uᵀ (proper rotation).
    h = jnp.einsum("...ni,...nj->...ij", s * w, d, precision=_HI)  # [..., 3, 3]
    u, _, vt = jnp.linalg.svd(h)
    v = jnp.swapaxes(vt, -1, -2)
    ut = jnp.swapaxes(u, -1, -2)
    det = jnp.linalg.det(jnp.matmul(v, ut, precision=_HI))
    sign = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    rot = jnp.matmul(v * sign[..., None, :], ut, precision=_HI)
    t = cd[..., 0, :] - jnp.einsum("...ij,...j->...i", rot, cs[..., 0, :],
                                   precision=_HI)
    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], src.dtype), top.shape[:-2] + (1, 4)
    )
    degenerate = jnp.sum(weights, axis=-1) <= 1e-12
    out = jnp.concatenate([top, bottom], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=src.dtype), out.shape)
    return jnp.where(degenerate[..., None, None], eye, out)
