"""Point-to-point and point-to-plane ICP refinement.

TPU-native replacement for the reference's Open3D ICP
(`utils/open3d_func.py:62-71`: threshold 0.2, point-to-point, 200
iterations). Fixed-iteration `lax.scan`; each iteration is one n×m
nearest-neighbor matmul + a pose refit — branchless and jittable.

Point-to-plane (`icp_plane_pose`) goes beyond the reference: independently
resampled scans give point-to-point ICP a bias floor (the same surface is
sampled at different points, so exact point matches do not exist), while
the point-to-plane residual (p − q)·n_q vanishes anywhere on the matched
local plane. Each iteration linearizes around the current pose and solves
one 6×6 normal system — all matmul-shaped.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.neighbors import pairwise_sqdist
from ..ops.se3 import exp_so3
from .kabsch import weighted_kabsch
from ..ops.precision import f32_geometry

Array = jax.Array


@f32_geometry
@partial(jax.jit, static_argnames=("max_iterations",))
def icp_pose(
    src: Array,
    dst: Array,
    init_transform: Array | None = None,
    max_correspondence_distance: float = 0.2,
    max_iterations: int = 50,
) -> Array:
    """src [n, 3], dst [m, 3] -> refined transform [4, 4].

    Correspondences are nearest neighbors within the distance gate; gated-out
    points get zero weight (Open3D semantics). The reference runs up to 200
    iterations with a convergence test; a fixed 50 converges on these clouds
    (iterations past convergence are no-ops on the fixed point).
    """
    init = jnp.eye(4, dtype=src.dtype) if init_transform is None else init_transform

    def step(transform, _):
        rot = transform[:3, :3]
        t = transform[:3, 3]
        moved = src @ rot.T + t
        d2 = pairwise_sqdist(moved, dst)
        nn_idx = jnp.argmin(d2, axis=-1)
        nn_d2 = jnp.take_along_axis(d2, nn_idx[:, None], axis=-1)[:, 0]
        w = (nn_d2 < max_correspondence_distance**2).astype(src.dtype)
        new_transform = weighted_kabsch(src, dst[nn_idx], w)
        return new_transform, None

    out, _ = jax.lax.scan(step, init, None, length=max_iterations)
    return out


@f32_geometry
@partial(jax.jit, static_argnames=("max_iterations",))
def icp_plane_pose(
    src: Array,
    dst: Array,
    dst_normals: Array,
    init_transform: Array | None = None,
    max_correspondence_distance: float = 0.2,
    max_iterations: int = 20,
    damping: float = 1e-6,
    rank_tau: float = 1e-3,
) -> Array:
    """Point-to-plane ICP: src [n, 3], dst [m, 3], dst_normals [m, 3]
    (unit) -> refined transform [4, 4].

    Per iteration: nearest dst point within the gate, then Gauss-Newton on
    r_i = (p'_i − q_i)·n_i with p' the currently-moved src points. The
    Jacobian row is J_i = [p'_i × n_i, n_i]; the damped 6×6 normal system
    solves in closed form and the rotation update is exp_so3(ω)·R (exact on
    the manifold, no re-orthogonalization drift).

    A pure plane objective is rank-deficient on plane-dominated scans
    (e.g. translation along a floor is free), so the point-to-point system
    is blended in — but only along the eigendirections of the plane
    Hessian that the plane residuals leave unconstrained (soft projector
    m_i = τλ_max/(λ_i + τλ_max) over the 6×6 eigenbasis). Where the plane
    system constrains a direction, the point term contributes ~nothing, so
    the resampling bias of point-to-point matching cannot leak back into
    well-conditioned poses; where it does not, the point term fills the
    null space.
    """
    init = (jnp.eye(4, dtype=src.dtype) if init_transform is None
            else init_transform)
    eye3 = jnp.eye(3, dtype=src.dtype)

    def step(transform, _):
        rot = transform[:3, :3]
        t = transform[:3, 3]
        moved = src @ rot.T + t                        # p'
        d2 = pairwise_sqdist(moved, dst)
        nn_idx = jnp.argmin(d2, axis=-1)
        nn_d2 = jnp.take_along_axis(d2, nn_idx[:, None], axis=-1)[:, 0]
        q = dst[nn_idx]
        n = dst_normals[nn_idx]
        w = (nn_d2 < max_correspondence_distance**2).astype(src.dtype)
        r = jnp.sum((moved - q) * n, axis=-1)          # [n]
        jac = jnp.concatenate([jnp.cross(moved, n), n], axis=-1)  # [n, 6]
        jw = jac * w[:, None]
        h = jw.T @ jac                                 # plane Hessian [6, 6]
        g = jw.T @ r
        # Point-to-point system, projected onto the plane system's weak
        # eigendirections only: r_p = p' − q, J_p = [−[p']ₓ | I] ([n, 3, 6]).
        skew = jnp.cross(moved[:, None, :], eye3[None])  # row j: p'×e_j
        jp = jnp.concatenate(
            [skew, jnp.broadcast_to(eye3, skew.shape)], axis=-1)
        rp = moved - q
        jpw = jp * w[:, None, None]
        h_pt = jnp.einsum("nij,nik->jk", jpw, jp)
        g_pt = jnp.einsum("nij,ni->j", jpw, rp)
        lam, vec = jnp.linalg.eigh(h)
        gate = rank_tau * jnp.maximum(lam[-1], 1e-20)
        mask = gate / (lam + gate)                     # ≈1 weak, ≈0 strong
        proj = (vec * mask[None, :]) @ vec.T           # soft null projector
        h = h + proj @ h_pt @ proj + damping * jnp.eye(6, dtype=src.dtype)
        g = g + proj @ g_pt
        delta = jnp.linalg.solve(h, -g)                # [ω, dt]
        rot_d = exp_so3(delta[:3])
        new_rot = rot_d @ rot
        new_t = rot_d @ t + delta[3:]
        new_transform = jnp.eye(4, dtype=src.dtype)
        new_transform = new_transform.at[:3, :3].set(new_rot)
        new_transform = new_transform.at[:3, 3].set(new_t)
        return new_transform, None

    out, _ = jax.lax.scan(step, init, None, length=max_iterations)
    return out
