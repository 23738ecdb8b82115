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
from .gnc import gnc_pose
from .icp import icp_pose
from .ransac import ransac_pose

Array = jax.Array

METHODS = ("ransac", "fgr", "teaserpp", "icp")


@partial(jax.jit, static_argnames=("method", "num_hypotheses"))
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
) -> tuple[Array, Array]:
    """One pair: pts [n, 3], feats [n, c] -> (transform [4, 4] mapping
    pts1 -> pts2, correspondence-inlier mask [n]).

    Method parameters mirror the reference configs: 'teaserpp' -> GNC-TLS
    with noise_bound 0.02 (deepgmr_mn40.py:173,207-216); 'ransac' ->
    voxel_size 0.08 (deepgmr_mn40.py:167); 'fgr' -> graduated Geman-McClure;
    'icp' -> threshold 0.2 from identity (open3d_func.py:62-71).
    """
    if method == "icp":
        transform = icp_pose(pts1, pts2)
        return transform, jnp.ones(pts1.shape[0], bool)

    idx1, idx2, mask = mutual_nearest_neighbors(feat1, feat2)
    src = pts1[idx1]
    dst = pts2[idx2]

    if method == "teaserpp":
        transform, w = gnc_pose(src, dst, mask, noise_bound=noise_bound)
        return transform, w > 0.5
    if method == "fgr":
        transform, w = gnc_pose(src, dst, mask, noise_bound=2 * noise_bound,
                                kind="gm")
        return transform, w > 0.5
    if method == "ransac":
        if key is None:
            key = jax.random.PRNGKey(0)
        return ransac_pose(key, src, dst, mask,
                           num_hypotheses=num_hypotheses,
                           inlier_threshold=inlier_threshold)
    raise ValueError(f"unknown method {method!r}; expected one of {METHODS}")
