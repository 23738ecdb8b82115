"""Point-to-point ICP refinement.

TPU-native replacement for the reference's Open3D ICP
(`utils/open3d_func.py:62-71`: threshold 0.2, point-to-point, 200
iterations). Fixed-iteration `lax.scan`; each iteration is one n×m
nearest-neighbor matmul + a Kabsch refit — branchless and jittable.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.neighbors import pairwise_sqdist
from .kabsch import weighted_kabsch

Array = jax.Array


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
