"""Frustum-PointNet box utilities and loss.

TPU-native equivalent of `PVCNN/modules/frustum.py` (reference inventory
SURVEY.md §2.3; unused by the shipped configs but part of the module zoo):
`get_box_corners_3d` (ref frustum.py:95-140) and the composite
FrustumPointNetLoss (ref frustum.py:11-92) as a pure function over pytrees
of predictions/targets — no module state, buffers become arguments.

Everything is batched and branchless: the per-sample gathers of the
reference (`[batch_id, bin_id]` indexing) are `take_along_axis`, so the
whole loss jits to one fused graph.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .losses import huber_loss

Array = jax.Array


def get_box_corners_3d(centers: Array, headings: Array, sizes: Array,
                       with_flip: bool = False):
    """Corners of upright 3-D boxes rotated about +y.

    centers [b, 3], headings [b], sizes [b, 3] (l, w, h) ->
    corners [b, 3, 8] (and the heading+pi flip if with_flip), with the
    reference's counter-clockwise corner ordering (ref frustum.py:95-140:
    x from l, y from h, z from w, roty rotation).
    """
    l, w, h = sizes[:, 0], sizes[:, 1], sizes[:, 2]
    sx = jnp.array([1, 1, -1, -1, 1, 1, -1, -1], centers.dtype)
    sy = jnp.array([1, 1, 1, 1, -1, -1, -1, -1], centers.dtype)
    sz = jnp.array([1, -1, -1, 1, 1, -1, -1, 1], centers.dtype)
    corners = jnp.stack([
        0.5 * l[:, None] * sx,
        0.5 * h[:, None] * sy,
        0.5 * w[:, None] * sz,
    ], axis=1)  # [b, 3, 8]

    def roty(c, s):
        z = jnp.zeros_like(c)
        o = jnp.ones_like(c)
        return jnp.stack([
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ], -2)  # [b, 3, 3]

    c, s = jnp.cos(headings), jnp.sin(headings)
    out = roty(c, s) @ corners + centers[:, :, None]
    if with_flip:
        # heading + pi: cos -> -cos, sin -> -sin.
        return out, roty(-c, -s) @ corners + centers[:, :, None]
    return out


def _softmax_xent(logits: Array, labels: Array) -> Array:
    logp = jax.nn.log_softmax(logits, axis=1)
    return -jnp.mean(jnp.take_along_axis(
        logp, labels[:, None].astype(jnp.int32), axis=1))


def frustum_pointnet_loss(
    inputs: dict, targets: dict,
    heading_angle_bin_centers: Array, size_templates: Array,
    box_loss_weight: float = 1.0, corners_loss_weight: float = 10.0,
    heading_residual_loss_weight: float = 20.0,
    size_residual_loss_weight: float = 20.0,
) -> Array:
    """Composite frustum loss (ref frustum.py:27-92).

    inputs: mask_logits [b,2,n], center_reg/center [b,3], heading_scores /
    heading_residuals(_normalized) [b,NH], size_scores [b,NS],
    size_residuals(_normalized) [b,NS,3].
    targets: mask_logits [b,n] int, center [b,3], heading_bin_id [b],
    heading_residual [b], size_template_id [b], size_residual [b,3].
    """
    num_heading_bins = heading_angle_bin_centers.shape[0]
    bin_id = targets["heading_bin_id"].astype(jnp.int32)
    size_id = targets["size_template_id"].astype(jnp.int32)

    mask_loss = _softmax_xent(
        inputs["mask_logits"], targets["mask_logits"])
    heading_loss = _softmax_xent(inputs["heading_scores"], bin_id)
    size_loss = _softmax_xent(inputs["size_scores"], size_id)
    center_loss = huber_loss(
        jnp.linalg.norm(targets["center"] - inputs["center"], axis=-1), 2.0)
    center_reg_loss = huber_loss(
        jnp.linalg.norm(targets["center"] - inputs["center_reg"], axis=-1), 1.0)

    pick = lambda x, i: jnp.take_along_axis(x, i[:, None], axis=1)[:, 0]
    hrn = pick(inputs["heading_residuals_normalized"], bin_id)
    hrn_target = targets["heading_residual"] / (jnp.pi / num_heading_bins)
    heading_residual_loss = huber_loss(hrn - hrn_target, 1.0)

    size_template = size_templates[size_id]  # [b, 3]
    srn = jnp.take_along_axis(
        inputs["size_residuals_normalized"], size_id[:, None, None], axis=1
    )[:, 0]  # [b, 3]
    srn_target = targets["size_residual"] / size_template
    size_residual_loss = huber_loss(
        jnp.linalg.norm(srn_target - srn, axis=-1), 1.0)

    heading = pick(inputs["heading_residuals"], bin_id) + \
        heading_angle_bin_centers[bin_id]
    size = jnp.take_along_axis(
        inputs["size_residuals"], size_id[:, None, None], axis=1
    )[:, 0] + size_template
    corners = get_box_corners_3d(inputs["center"], heading, size)
    heading_target = heading_angle_bin_centers[bin_id] + \
        targets["heading_residual"]
    size_target = size_template + targets["size_residual"]
    corners_target, corners_target_flip = get_box_corners_3d(
        targets["center"], heading_target, size_target, with_flip=True)
    corners_loss = huber_loss(jnp.minimum(
        jnp.linalg.norm(corners - corners_target, axis=1),
        jnp.linalg.norm(corners - corners_target_flip, axis=1)), 1.0)

    return mask_loss + box_loss_weight * (
        center_loss + center_reg_loss + heading_loss + size_loss
        + heading_residual_loss_weight * heading_residual_loss
        + size_residual_loss_weight * size_residual_loss
        + corners_loss_weight * corners_loss)
