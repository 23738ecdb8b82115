"""Vectorized correspondence-based RANSAC.

TPU-native replacement for the reference's Open3D call
(`utils/open3d_func.py:40-50`
`registration_ransac_based_on_feature_matching` with edge-length 0.9 and
distance checkers, max_iter=1000/max_val=500 per
`deepgmr_mn40.py:167`). Instead of a sequential hypothesize-and-verify loop,
ALL hypotheses are drawn and scored at once: [K, 3] index draws -> vmapped
Kabsch -> [K, n] residual matrix (one big matmul batch) -> argmax inliers
-> weighted refit on the winner's inliers. Deterministic, jittable, O(K·n)
on the MXU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .kabsch import weighted_kabsch
from ..ops.precision import f32_geometry

Array = jax.Array


@partial(jax.jit, static_argnames=("num_hypotheses", "sample_size",
                                   "irls_iterations", "irls_shrink"))
@f32_geometry
def ransac_pose(
    key: Array,
    src: Array,
    dst: Array,
    valid: Array,
    num_hypotheses: int = 512,
    sample_size: int = 3,
    inlier_threshold: float = 0.08,
    edge_similarity: float = 0.9,
    irls_iterations: int = 3,
    irls_shrink: float = 1.0,
) -> tuple[Array, Array]:
    """Robust SE(3) from putative correspondences.

    src/dst [n, 3] matched point pairs, valid [n] bool mask (masked pairs are
    never sampled and never counted). Returns (transform [4, 4],
    inlier mask [n]).

    Checks mirror the reference's Open3D configuration:
    - edge-length checker: a hypothesis is discarded unless all intra-sample
      edge ratios satisfy min(e_s, e_d)/max(e_s, e_d) > edge_similarity;
    - distance checker / inlier rule: ‖T·src - dst‖ < inlier_threshold
      (voxel_size = 0.08).
    """
    n = src.shape[0]
    k1, _ = jax.random.split(key)
    # Sample [K, sample_size] valid indices (Gumbel top-k over the mask).
    logits = jnp.where(valid, 0.0, -jnp.inf)
    gumbel = jax.random.gumbel(k1, (num_hypotheses, n))
    _, samples = jax.lax.top_k(logits[None, :] + gumbel, sample_size)  # [K, s]

    s_pts = src[samples]  # [K, s, 3]
    d_pts = dst[samples]

    # Edge-length consistency (CorrespondenceCheckerBasedOnEdgeLength(0.9)).
    def edge_ok(pts_s, pts_d):
        diff_s = pts_s[:, None, :] - pts_s[None, :, :]
        diff_d = pts_d[:, None, :] - pts_d[None, :, :]
        es = jnp.linalg.norm(diff_s, axis=-1)
        ed = jnp.linalg.norm(diff_d, axis=-1)
        ratio = jnp.minimum(es, ed) / jnp.maximum(jnp.maximum(es, ed), 1e-12)
        off = ~jnp.eye(pts_s.shape[0], dtype=bool)
        return jnp.all((ratio > edge_similarity) | ~off)

    ok = jax.vmap(edge_ok)(s_pts, d_pts)  # [K]

    hyp = jax.vmap(weighted_kabsch)(s_pts, d_pts)  # [K, 4, 4]
    rot = hyp[:, :3, :3]
    t = hyp[:, :3, 3]
    # Residuals for all correspondences under all hypotheses: [K, n]
    transformed = jnp.einsum("kij,nj->kni", rot, src) + t[:, None, :]
    resid = jnp.linalg.norm(transformed - dst[None], axis=-1)
    inliers = (resid < inlier_threshold) & valid[None, :]
    score = jnp.sum(inliers, axis=-1) * ok  # failed checker -> score 0
    best = jnp.argmax(score)
    best_inliers = inliers[best]
    # Refine on the winning inlier set (falls back to identity when empty),
    refined = weighted_kabsch(src, dst, best_inliers.astype(src.dtype))

    # ... then Tukey-biweight IRLS on ALL correspondences (c = the inlier
    # threshold): the hard 0/1 refit weights a boundary match the same as
    # a dead-center one, so the estimate inherits the noise of its worst
    # inliers — the smooth redescending weight w = (1 - (r/c)^2)^2 pulls
    # the solution toward the well-matched core. Open3D's RANSAC does only
    # the hard refit; this measurably tightens rotation on scan-resampled
    # pairs where residuals sit near the threshold.
    def tukey_step(t, _):
        moved = jnp.einsum("ij,nj->ni", t[:3, :3], src) + t[:3, 3]
        r = jnp.linalg.norm(moved - dst, axis=-1)
        u = r / inlier_threshold
        w = jnp.where((u < 1.0) & valid, (1.0 - u**2) ** 2, 0.0)
        return weighted_kabsch(src, dst, w), None

    refined, _ = jax.lax.scan(tukey_step, refined, None,
                              length=irls_iterations)
    if irls_shrink != 1.0:
        # Optional second IRLS phase with a tighter Tukey c: the
        # redescending weight re-focused on the best-matched core polishes
        # rotation once the wide-c phase has converged (sweepable knob for
        # the ICL-NUIM RRE bound).
        def tukey_tight(t, _):
            moved = jnp.einsum("ij,nj->ni", t[:3, :3], src) + t[:3, 3]
            r = jnp.linalg.norm(moved - dst, axis=-1)
            u = r / (inlier_threshold * irls_shrink)
            w = jnp.where((u < 1.0) & valid, (1.0 - u**2) ** 2, 0.0)
            return weighted_kabsch(src, dst, w), None

        refined, _ = jax.lax.scan(tukey_tight, refined, None, length=2)
    moved = jnp.einsum("ij,nj->ni", refined[:3, :3], src) + refined[:3, 3]
    final_inliers = (jnp.linalg.norm(moved - dst, axis=-1)
                     < inlier_threshold) & valid
    return refined, final_inliers
