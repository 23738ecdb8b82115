"""Two-stage registration pipeline: features -> mutual-NN -> robust pose.

TPU-native equivalent of the reference's evaluation path
(`datasets/deepgmr_mn40.py:114-231` register_one_pair +
`utils/open3d_func.py:34-75`): extract per-point features with the frozen
backbone, build cycle-consistent mutual-NN correspondences, then estimate
the pose with a robust solver ('ransac' | 'fgr' | 'teaserpp' | 'icp').
Everything stays on device; pairs can be vmapped/sharded (see parallel/).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.neighbors import mutual_nearest_neighbors
from .gnc import gnc_pose, teaser_pose
from .icp import icp_plane_pose, icp_pose
from .ransac import ransac_pose
from ..ops.precision import f32_geometry

Array = jax.Array

METHODS = ("ransac", "fgr", "teaserpp", "icp",
           "ransac+icp", "fgr+icp", "teaserpp+icp",
           "ransac+picp", "fgr+picp", "teaserpp+picp",
           "ransac+pl", "fgr+pl", "teaserpp+pl")


@f32_geometry
@partial(jax.jit, static_argnames=("method", "num_hypotheses",
                                   "irls_iterations", "irls_shrink"))
def register_pair(
    pts1: Array,
    pts2: Array,
    feat1: Array,
    feat2: Array,
    key: Array | None = None,
    method: str = "teaserpp",
    noise_bound: float = 0.02,
    inlier_threshold: float = 0.08,
    num_hypotheses: int = 512,
    irls_iterations: int = 3,
    irls_shrink: float = 1.0,
) -> tuple[Array, Array]:
    """One pair: pts [n, 3], feats [n, c] -> (transform [4, 4] mapping
    pts1 -> pts2, correspondence-inlier mask [n]).

    Method parameters mirror the reference configs: 'teaserpp' -> GNC-TLS
    with noise_bound 0.02 (deepgmr_mn40.py:173,207-216); 'ransac' ->
    voxel_size 0.08 (deepgmr_mn40.py:167); 'fgr' -> graduated Geman-McClure;
    'icp' -> threshold 0.2 from identity (open3d_func.py:62-71).

    A '+icp' suffix ('ransac+icp', ...) runs dense point-to-point ICP from
    the robust estimate: the robust solver works on mutual-NN feature
    correspondences only, so its answer is bounded by matching noise; the
    dense geometric polish converges to sub-degree poses whenever the
    robust init lands in the true basin. (The reference treats ICP only as
    a standalone from-identity method, open3d_func.py:62-71; composing it
    as a refiner is strictly stronger and costs one extra lax.scan.)
    '+picp' refines point-to-PLANE instead (normals estimated on device):
    independently resampled scans give point-to-point ICP a bias floor;
    the plane residual removes it (see registration/icp.py).
    """
    refine = None
    for suffix in ("+icp", "+picp", "+pl"):
        if method.endswith(suffix):
            refine = suffix
            method = method[: -len(suffix)]
            break
    if method == "icp":
        transform = icp_pose(pts1, pts2)
        return transform, jnp.ones(pts1.shape[0], bool)

    idx1, idx2, mask = mutual_nearest_neighbors(feat1, feat2)
    return register_pair_from_matches(
        pts1, pts2, idx1, idx2, mask, key=key,
        method=method + (refine or ""), noise_bound=noise_bound,
        inlier_threshold=inlier_threshold, num_hypotheses=num_hypotheses,
        irls_iterations=irls_iterations, irls_shrink=irls_shrink)


@partial(jax.jit, static_argnames=("method", "num_hypotheses",
                                   "irls_iterations", "irls_shrink"))
@f32_geometry
def register_pair_from_matches(
    pts1: Array,
    pts2: Array,
    idx1: Array,
    idx2: Array,
    mask: Array,
    key: Array | None = None,
    method: str = "teaserpp",
    noise_bound: float = 0.02,
    inlier_threshold: float = 0.08,
    num_hypotheses: int = 512,
    irls_iterations: int = 3,
    irls_shrink: float = 1.0,
) -> tuple[Array, Array]:
    """Robust pose (+ optional dense refinement) from PRECOMPUTED putative
    correspondences (idx1, idx2, mask) — the entry point for callers that
    build matches themselves (e.g. flip-hypothesis consensus matching,
    registration/consensus.py)."""
    refine = None
    for suffix in ("+icp", "+picp", "+pl"):
        if method.endswith(suffix):
            refine = suffix
            method = method[: -len(suffix)]
            break
    src = pts1[idx1]
    dst = pts2[idx2]

    if method == "teaserpp":
        # Full TEASER pipeline since round 5: compatibility-core pruning +
        # TIM-decoupled rotation/translation + GNC-TLS polish (gnc.py).
        transform, w = teaser_pose(src, dst, mask, noise_bound=noise_bound)
        inliers = w > 0.5
    elif method == "fgr":
        transform, w = gnc_pose(src, dst, mask, noise_bound=2 * noise_bound,
                                kind="gm")
        inliers = w > 0.5
    elif method == "ransac":
        if key is None:
            key = jax.random.PRNGKey(0)
        transform, inliers = ransac_pose(key, src, dst, mask,
                                         num_hypotheses=num_hypotheses,
                                         inlier_threshold=inlier_threshold,
                                         irls_iterations=irls_iterations,
                                         irls_shrink=irls_shrink)
    else:
        raise ValueError(
            f"unknown method {method!r}; expected one of {METHODS}")
    if refine == "+icp":
        transform = icp_pose(pts1, pts2, init_transform=transform)
    elif refine == "+picp":
        # Coarse-to-fine: point-to-point first (wide 0.2 gate, robust to a
        # coarse init), then point-to-plane with a tight gate — the plane
        # residual removes the resampling bias floor but is sensitive to
        # wrong-surface matches, so it only runs near the optimum.
        from ..ops.normals import estimate_normals

        transform = icp_pose(pts1, pts2, init_transform=transform)
        transform = icp_plane_pose(pts1, pts2, estimate_normals(pts2),
                                   init_transform=transform,
                                   max_correspondence_distance=0.05)
    elif refine == "+pl":
        # Plane-only polish straight from the robust init: on scene-scale
        # scans (planar walls/floors, independent resampling) the
        # point-to-point prestep of '+picp' latches onto resampling offsets
        # and biases ROTATION (measured on the ICL-NUIM analog: ransac
        # 0.93deg -> ransac+picp 1.66deg), while the plane residual is
        # insensitive to in-plane resampling. Gate scales with the noise
        # model instead of the '+picp' fixed 0.05.
        from ..ops.normals import estimate_normals

        transform = icp_plane_pose(pts1, pts2, estimate_normals(pts2),
                                   init_transform=transform,
                                   max_correspondence_distance=3.0 * noise_bound)
    return transform, inliers
