"""Registration error metrics: RRE / RTE / RMSE / success rates.

Exact semantics of `datasets/deepgmr_mn40.py:101-164`
(MeterModelNet40_registration), as pure jittable functions; the stateful
meter objects that accumulate them across a dataset live in
`rift_tpu.train.meters`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.precision import f32_geometry

from ..ops import se3

Array = jax.Array

# Success thresholds (deepgmr_mn40.py:110-113).
ROT_THRESH_DEG = 1e-5
TRANS_THRESH = 0.005
RMSE_THRESH = 0.2


def rpmnet_metrics(points_src: Array, points_ref: Array, gt_transform: Array,
                   est_transform: Array) -> dict:
    """RPM-Net-style metric family (ref: datasets/mn40_hdf.py:274-478 meter):
    r_mse/r_mae (degrees, from euler-free rotation geodesic), t_mse/t_mae,
    err_r_deg, err_t, chamfer distance of the aligned clouds."""
    from ..ops.losses import chamfer_distance

    rre = se3.rotation_error_deg(se3.rot_of(gt_transform), se3.rot_of(est_transform))
    dt = se3.trans_of(gt_transform) - se3.trans_of(est_transform)
    aligned = se3.transform_points(est_transform, points_src)
    return {
        "r_mse": rre**2,
        "r_mae": rre,
        "t_mse": jnp.sum(dt**2, axis=-1),
        "t_mae": jnp.mean(jnp.abs(dt), axis=-1),
        "err_r_deg": rre,
        "err_t": jnp.linalg.norm(dt, axis=-1),
        "chamfer": chamfer_distance(aligned, points_ref),
    }


@f32_geometry
def pair_errors(points: Array, gt_transform: Array, est_transform: Array) -> dict:
    """points [..., n, 3]; transforms [..., 4, 4] -> dict of [...]-shaped
    metrics: rre (deg), rte, rmse, succ, rmse_succ."""
    rre = se3.rotation_error_deg(se3.rot_of(gt_transform), se3.rot_of(est_transform))
    rte = se3.translation_error(se3.trans_of(gt_transform), se3.trans_of(est_transform))
    rmse = se3.registration_rmse(points, gt_transform, est_transform)
    succ = (rre < ROT_THRESH_DEG) & (rte < TRANS_THRESH)
    return {
        "rre": rre,
        "rte": rte,
        "rmse": rmse,
        "succ": succ.astype(jnp.float32),
        "rmse_succ": (rmse < RMSE_THRESH).astype(jnp.float32),
    }
