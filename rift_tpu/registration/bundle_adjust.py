"""Bundle adjustment over poses + landmarks with Schur-complement reduction,
single-chip and mesh-distributed.

North-star extension (BASELINE.md: "distributed bundle adjustment reduces
the Schur complement over ICI collectives"). Model: scan poses T_i map
scan-local coordinates to world (X_w = T_i · y); landmark l observed in
scan i at local coords y_il. Residual r_il = T_i⁻¹ X_l - y_il.

TPU-first structure:
- observations are stored landmark-major with a fixed fan-out K
  (obs_pose [Nl, K] int32 with -1 padding, obs_local [Nl, K, 3]) — a
  regular, maskable layout instead of CSR-style ragged lists;
- per-observation Jacobians from `jax.jacfwd`, vmapped over the [Nl, K]
  grid;
- H_ll is 3×3 block-diagonal -> closed-form batched inversion; the Schur
  complement S = H_pp - Σ_l W_l H_ll⁻¹ W_lᵀ is assembled with one
  [K, K]-pair einsum per landmark and scattered into the dense [6Np, 6Np]
  pose system (Np is small: scans, not points);
- distribution: landmarks (and their observation rows) are sharded over the
  mesh data axis with shard_map; each device computes its partial (S, b);
  `jax.lax.psum` reduces them over ICI; the reduced pose solve is
  replicated; landmark back-substitution happens shard-locally.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import se3
from ..ops.precision import f32_geometry

Array = jax.Array


def _obs_residual(xi: Array, x_l: Array, pose: Array, y_obs: Array) -> Array:
    """r = (T Exp(ξ))⁻¹ · X_l - y_obs ∈ R³."""
    t = pose @ se3.exp_se3(xi)
    return se3.transform_points(se3.inverse(t), x_l[None, :])[0] - y_obs


def _obs_terms(pose, x_l, y_obs):
    zero = jnp.zeros(6, pose.dtype)
    r = _obs_residual(zero, x_l, pose, y_obs)
    j_pose = jax.jacfwd(_obs_residual, argnums=0)(zero, x_l, pose, y_obs)  # [3,6]
    j_lm = jax.jacfwd(_obs_residual, argnums=1)(zero, x_l, pose, y_obs)   # [3,3]
    return r, j_pose, j_lm


def _inv3(m: Array) -> Array:
    """Batched closed-form 3×3 inverse (adjugate / det)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co = jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], -1),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1),
    ], -2)
    det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    return co / jnp.maximum(jnp.abs(det), 1e-12)[..., None, None] * jnp.sign(det)[..., None, None]


def _landmark_terms(poses, landmarks, obs_pose, obs_local, damping,
                    huber_delta=None):
    """Per-landmark blocks: (W [Nl,K,6,3]... reduced to Schur pieces).

    With `huber_delta`, each observation is IRLS-weighted by the Huber
    influence w = min(1, δ/‖r‖) at the current iterate (√w scales r and
    both Jacobians): mismatched correspondences — matches that are not the
    same physical point — get bounded influence instead of quadratically
    dragging the poses toward closing a gap that should not close.
    """
    nl, k = obs_pose.shape
    valid = obs_pose >= 0
    safe_pose = jnp.maximum(obs_pose, 0)
    pose_per_obs = poses[safe_pose]                       # [Nl, K, 4, 4]
    lm_per_obs = jnp.broadcast_to(landmarks[:, None, :], (nl, k, 3))

    r, j_p, j_l = jax.vmap(jax.vmap(_obs_terms))(pose_per_obs, lm_per_obs,
                                                 obs_local)
    m = valid[..., None, None]
    r = jnp.where(valid[..., None], r, 0.0)
    j_p = jnp.where(m, j_p, 0.0)
    j_l = jnp.where(m, j_l, 0.0)
    if huber_delta is not None:
        rn = jnp.linalg.norm(r, axis=-1)                  # [Nl, K]
        sw = jnp.sqrt(jnp.minimum(1.0, huber_delta / jnp.maximum(rn, 1e-12)))
        r = r * sw[..., None]
        j_p = j_p * sw[..., None, None]
        j_l = j_l * sw[..., None, None]

    # H_ll [Nl, 3, 3] + damping, its inverse; W_k = J_pᵀ J_l  [Nl, K, 6, 3]
    h_ll = jnp.einsum("nkri,nkrj->nij", j_l, j_l) + damping * jnp.eye(3)
    a_inv = _inv3(h_ll)                                   # [Nl, 3, 3]
    w = jnp.einsum("nkri,nkrj->nkij", j_p, j_l)           # [Nl, K, 6, 3]
    b_p = jnp.einsum("nkri,nkr->nki", j_p, r)             # [Nl, K, 6]
    b_l = jnp.einsum("nkri,nkr->ni", j_l, r)              # [Nl, 3]
    h_pp_diag = jnp.einsum("nkri,nkrj->nkij", j_p, j_p)   # [Nl, K, 6, 6]
    return valid, r, a_inv, w, b_p, b_l, h_pp_diag


def _assemble_schur(poses, landmarks, obs_pose, obs_local, damping,
                    huber_delta=None):
    """Partial Schur system from a landmark shard:
    (S [Np,Np,6,6], b [Np,6], plus back-substitution residuals)."""
    num_poses = poses.shape[0]
    valid, r, a_inv, w, b_p, b_l, h_pp_diag = _landmark_terms(
        poses, landmarks, obs_pose, obs_local, damping, huber_delta
    )
    safe_pose = jnp.maximum(obs_pose, 0)

    s = jnp.zeros((num_poses, num_poses, 6, 6), poses.dtype)
    b = jnp.zeros((num_poses, 6), poses.dtype)
    # H_pp diagonal contributions
    s = s.at[safe_pose, safe_pose].add(h_pp_diag)
    b = b.at[safe_pose].add(b_p)
    # Schur correction: - W_k A⁻¹ W_k'ᵀ for all (k, k') obs pairs per landmark
    wa = jnp.einsum("nkij,njl->nkil", w, a_inv)           # [Nl, K, 6, 3]
    corr = jnp.einsum("nkil,nqjl->nkqij", wa, w)          # [Nl, K, K, 6, 6]
    b_corr = jnp.einsum("nkil,nl->nki", wa, b_l)          # [Nl, K, 6]
    nl, k = obs_pose.shape
    rows = jnp.broadcast_to(safe_pose[:, :, None], (nl, k, k))
    cols = jnp.broadcast_to(safe_pose[:, None, :], (nl, k, k))
    s = s.at[rows, cols].add(-corr)
    b = b.at[safe_pose].add(-b_corr)
    return s, b, (a_inv, w, b_l, safe_pose)


def _solve_poses(s, b, num_poses, dtype, damping, extra=None):
    n6 = num_poses * 6
    h = jnp.transpose(s, (0, 2, 1, 3)).reshape(n6, n6)
    bb = b.reshape(n6)
    if extra is not None:  # pose-graph edge system (joint BA)
        h_e, b_e = extra
        h = h + h_e
        bb = bb + b_e
    prior = jnp.zeros(n6, dtype).at[:6].set(1e6)  # gauge: pin pose 0
    h = h + jnp.diag(prior) + damping * jnp.eye(n6, dtype=dtype)
    return -jnp.linalg.solve(h, bb).reshape(num_poses, 6)


def _edge_system(poses, edges):
    """Pose-graph edge normal equations at the current iterate (flat
    [6N,6N], [6N]) — see pose_graph._assemble."""
    from .pose_graph import _assemble

    i_idx, j_idx, rel_meas, w_e = edges
    return _assemble(poses, i_idx, j_idx, se3.inverse(rel_meas), w_e,
                     poses.shape[0])


def _edge_cost(poses, edges):
    from .pose_graph import _edge_terms

    i_idx, j_idx, rel_meas, w_e = edges
    r, _, _ = jax.vmap(_edge_terms)(poses[i_idx], poses[j_idx],
                                    se3.inverse(rel_meas))
    return 0.5 * jnp.sum(w_e * jnp.sum(r**2, axis=-1))


def _back_substitute(delta_p, aux):
    a_inv, w, b_l, safe_pose = aux
    dp = delta_p[safe_pose]                               # [Nl, K, 6]
    rhs = b_l + jnp.einsum("nkij,nki->nj", w, dp)         # [Nl, 3]
    return -jnp.einsum("nij,nj->ni", a_inv, rhs)


def _robust_cost(poses, landmarks, obs_pose, obs_local, huber_delta):
    """Mean Huber cost over valid observations (monitor for the guard)."""
    valid = obs_pose >= 0
    safe_pose = jnp.maximum(obs_pose, 0)
    nl, k = obs_pose.shape
    r = jax.vmap(jax.vmap(
        lambda p, x, y: _obs_residual(jnp.zeros(6, p.dtype), x, p, y)))(
        poses[safe_pose],
        jnp.broadcast_to(landmarks[:, None, :], (nl, k, 3)), obs_local)
    rn = jnp.linalg.norm(jnp.where(valid[..., None], r, 0.0), axis=-1)
    d = huber_delta if huber_delta is not None else 1e9
    cost = jnp.where(rn <= d, 0.5 * rn**2, d * (rn - 0.5 * d))
    cost = jnp.where(valid, cost, 0.0)
    return jnp.sum(cost) / jnp.maximum(jnp.sum(valid), 1)


@f32_geometry
@partial(jax.jit, static_argnames=("num_iterations", "huber_delta"))
def bundle_adjust(poses: Array, landmarks: Array, obs_pose: Array,
                  obs_local: Array, num_iterations: int = 10,
                  damping: float = 1e-4,
                  huber_delta: float | None = 0.05,
                  edges: tuple[Array, Array, Array, Array] | None = None
                  ) -> tuple[Array, Array]:
    """Joint pose+landmark refinement.

    poses [Np, 4, 4], landmarks [Nl, 3], obs_pose [Nl, K] int32 (-1 pad),
    obs_local [Nl, K, 3] -> (poses, landmarks) optimized, pose 0 fixed.

    `huber_delta` enables robust IRLS weighting (see _landmark_terms).

    `edges = (i_idx [E], j_idx [E], rel_meas [E,4,4] measured T_i^-1 T_j,
    w_e [E])` makes the solve JOINT with the pose-graph constraints: the
    edge normal equations are added to the landmark Schur system every
    iteration, and the accept guard compares the joint cost. Without edge
    anchoring, a low-inlier landmark set can pull poses into a
    landmark-cost valley that contradicts the (far more informative)
    pairwise registrations — measured on the round-3 showcase as BA
    worsening ATE 0.0044 -> 0.0121 while improving its own landmark-only
    cost. Weight w_e with the edge's INLIER COUNT (each robust pairwise
    measurement summarizes that many point correspondences, so its
    information weight is their sum, not 1).
    """
    num_poses = poses.shape[0]

    def step(carry, _):
        poses, landmarks = carry
        s, b, aux = _assemble_schur(poses, landmarks, obs_pose, obs_local,
                                    damping, huber_delta)
        extra = _edge_system(poses, edges) if edges is not None else None
        delta_p = _solve_poses(s, b, num_poses, poses.dtype, damping, extra)
        delta_l = _back_substitute(delta_p, aux)
        return (poses @ se3.exp_se3(delta_p), landmarks + delta_l), None

    (new_poses, new_landmarks), _ = jax.lax.scan(
        step, (poses, landmarks), None, length=num_iterations
    )

    def total_cost(p, lm):
        n_obs = jnp.maximum(jnp.sum(obs_pose >= 0), 1)
        c = _robust_cost(p, lm, obs_pose, obs_local, huber_delta) * n_obs
        if edges is not None:
            c = c + _edge_cost(p, edges)
        return c

    keep = total_cost(new_poses, new_landmarks) < total_cost(poses, landmarks)
    return (jnp.where(keep, new_poses, poses),
            jnp.where(keep, new_landmarks, landmarks))


@f32_geometry
def bundle_adjust_sharded(poses: Array, landmarks: Array, obs_pose: Array,
                          obs_local: Array, mesh, num_iterations: int = 10,
                          damping: float = 1e-4, axis: str = "data",
                          huber_delta: float | None = 0.05,
                          edges: tuple[Array, Array, Array, Array] | None = None
                          ) -> tuple[Array, Array]:
    """Landmark-sharded BA: per-shard partial Schur systems psum-reduced
    over ICI, replicated pose solve, shard-local landmark back-substitution.
    Nl must divide the mesh size. Same Huber IRLS + joint edge anchoring +
    cost guard as `bundle_adjust` (landmark costs psum-reduced, the edge
    system added once after the psum — edges are replicated, not sharded,
    because E is O(scans), tiny next to Nl)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    num_poses = poses.shape[0]

    def shard_cost(poses, lms, op_shard, ol_shard):
        valid = (op_shard >= 0).sum()
        return jax.lax.psum(
            _robust_cost(poses, lms, op_shard, ol_shard, huber_delta)
            * jnp.maximum(valid, 1), axis)

    def solve(poses, lm_shard, op_shard, ol_shard):
        def step(carry, _):
            poses, lms = carry
            s, b, aux = _assemble_schur(poses, lms, op_shard, ol_shard,
                                        damping, huber_delta)
            s = jax.lax.psum(s, axis)
            b = jax.lax.psum(b, axis)
            extra = _edge_system(poses, edges) if edges is not None else None
            delta_p = _solve_poses(s, b, num_poses, poses.dtype, damping,
                                   extra)
            delta_l = _back_substitute(delta_p, aux)
            return (poses @ se3.exp_se3(delta_p), lms + delta_l), None

        (new_poses, new_lms), _ = jax.lax.scan(step, (poses, lm_shard), None,
                                               length=num_iterations)
        c0 = shard_cost(poses, lm_shard, op_shard, ol_shard)
        c1 = shard_cost(new_poses, new_lms, op_shard, ol_shard)
        if edges is not None:
            c0 = c0 + _edge_cost(poses, edges)
            c1 = c1 + _edge_cost(new_poses, edges)
        keep = c1 < c0
        return (jnp.where(keep, new_poses, poses),
                jnp.where(keep, new_lms, lm_shard))

    fn = shard_map(
        solve, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(axis)),
        check_vma=False,
    )
    return fn(poses, landmarks, obs_pose, obs_local)
