"""Weighted Kabsch/Umeyama rigid alignment — the inner solver shared by
RANSAC, GNC and ICP.

The reference delegates this to Open3D's TransformationEstimationPointToPoint
(`utils/open3d_func.py:43-47`); here the optimal rotation comes from a
closed-form 3×3 polar decomposition (ops/eig3.py eigenbasis of HᵀH) instead
of a general SVD kernel: measured ~30x cheaper on TPU, and it sits inside
the GNC/ICP iteration loops. Derivation: with right-handed eigenbases
V of HᵀH and U = [u1×u2, u1, u2] (uᵢ = Hvᵢ/σᵢ), H = U·diag(s0, σ1, σ2)·Vᵀ
with the reflection sign absorbed into s0; maximizing tr(RᵀH) over SO(3)
then yields R = U·Vᵀ exactly (the σ1 >= |s0| ordering makes the identity
the optimal diagonal), covering the det-correction case of the classic
SVD formula.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.eig3 import eigh_sym3

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST


def rotation_from_h(h: Array) -> Array:
    """Optimal rotation R = argmax_{R in SO(3)} tr(RᵀH) for [..., 3, 3] H.

    Closed form via the eigenbasis of HᵀH; degenerate ranks fall back
    gracefully (rank<=1 -> any completion; H~0 -> identity).
    """
    hth = jnp.matmul(jnp.swapaxes(h, -1, -2), h, precision=_HI)
    vals, vecs = eigh_sym3(hth)  # ascending; right-handed columns
    v0, v1, v2 = vecs[..., 0], vecs[..., 1], vecs[..., 2]
    sigma2 = jnp.sqrt(jnp.maximum(vals[..., 2], 0.0))
    sigma1 = jnp.sqrt(jnp.maximum(vals[..., 1], 0.0))

    hv2 = jnp.einsum("...ij,...j->...i", h, v2, precision=_HI)
    u2 = hv2 / jnp.maximum(
        jnp.linalg.norm(hv2, axis=-1, keepdims=True), 1e-20
    )
    hv1 = jnp.einsum("...ij,...j->...i", h, v1, precision=_HI)
    # Orthogonalize against u2 for numerical safety.
    hv1 = hv1 - jnp.sum(hv1 * u2, axis=-1, keepdims=True) * u2
    n1 = jnp.linalg.norm(hv1, axis=-1, keepdims=True)
    # Rank-1 fallback: any unit vector orthogonal to u2.
    alt = jnp.cross(u2, jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], h.dtype), u2.shape))
    alt2 = jnp.cross(u2, jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], h.dtype), u2.shape))
    alt = jnp.where(
        (jnp.linalg.norm(alt, axis=-1, keepdims=True) > 0.1), alt, alt2
    )
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True), 1e-20)
    u1 = jnp.where(n1 > 1e-12 * jnp.maximum(sigma2[..., None], 1.0),
                   hv1 / jnp.maximum(n1, 1e-20), alt)
    u0 = jnp.cross(u1, u2)

    rot = (
        u0[..., :, None] * v0[..., None, :]
        + u1[..., :, None] * v1[..., None, :]
        + u2[..., :, None] * v2[..., None, :]
    )
    # H ~ 0: no signal, return identity.
    eye = jnp.broadcast_to(jnp.eye(3, dtype=h.dtype), rot.shape)
    del sigma1
    return jnp.where((sigma2 > 1e-12)[..., None, None], rot, eye)


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
    # H = Σᵢ wᵢ·sᵢ⊗dᵢ; dst ≈ R·src needs R = argmax tr(RᵀHᵀ) over SO(3).
    h = jnp.einsum("...ni,...nj->...ij", s * w, d, precision=_HI)  # [..., 3, 3]
    rot = rotation_from_h(jnp.swapaxes(h, -1, -2))
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
