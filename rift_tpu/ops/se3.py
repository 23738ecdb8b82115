"""SE(3)/SO(3) math, JAX-native and batched.

Capability parity with the reference's numpy/torch helpers
(`datasets/math/se3.py`, `datasets/math_torch/se3.py`,
`utils/open3d_func.py:85-131`), redesigned as pure jittable functions over
`[..., 4, 4]` transforms and `[..., n, 3]` point arrays (row-vector points,
TPU-friendly trailing contraction dims).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST  # small SE(3) contractions need full fp32


def hat(w: Array) -> Array:
    """Skew-symmetric matrix of w: [..., 3] -> [..., 3, 3]."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def _sinc_coeffs(theta2: Array) -> tuple[Array, Array, Array]:
    """(sinθ/θ, (1-cosθ)/θ², (θ-sinθ)/θ³) with Taylor branches near 0 —
    written so the *selected* branch has the right derivative at θ=0
    (a bare jnp.where on the assembled matrix kills rotation gradients)."""
    small = theta2 < 1e-8
    safe2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (safe2 * theta))
    return a, b, c


def exp_so3(w: Array) -> Array:
    """Rodrigues: axis-angle [..., 3] -> rotation matrix [..., 3, 3].
    Differentiable everywhere including θ = 0."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    a, b, _ = _sinc_coeffs(theta2)
    k = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    return eye + a * k + b * jnp.matmul(k, k, precision=_HI)


def log_so3(rot: Array) -> Array:
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3].

    cos is clipped strictly inside (-1, 1): arccos has an infinite
    derivative at ±1, which poisons jacobians of residuals that pass
    through the identity (pose-graph/GN). With the clip active the arccos
    gradient is zeroed and the Taylor branch below supplies the correct
    near-identity derivative.
    """
    tr = jnp.trace(rot, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos)
    vee = jnp.stack(
        [
            rot[..., 2, 1] - rot[..., 1, 2],
            rot[..., 0, 2] - rot[..., 2, 0],
            rot[..., 1, 0] - rot[..., 0, 1],
        ],
        axis=-1,
    )
    # θ/(2 sinθ) with its Taylor branch (0.5 + θ²/12) so gradients survive
    # θ -> 0 (see _sinc_coeffs note).
    small = theta < 1e-4
    safe_sin = jnp.where(small, 1.0, jnp.sin(theta))
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * safe_sin))
    return vee * scale[..., None]


def _v_matrix(w: Array) -> Array:
    """Left Jacobian V of SO(3): exp_se3 translation factor.
    V = I + (1-cosθ)/θ²·K + (θ-sinθ)/θ³·K², K = hat(w); Taylor-safe."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    _, b, c = _sinc_coeffs(theta2)
    k = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    return eye + b * k + c * jnp.matmul(k, k, precision=_HI)


def exp_se3(xi: Array) -> Array:
    """se(3) exponential: twist [..., 6] (w | v) -> transform [..., 4, 4]."""
    w, v = xi[..., :3], xi[..., 3:]
    rot = exp_so3(w)
    t = jnp.einsum("...ij,...j->...i", _v_matrix(w), v)
    return make_se3(rot, t)


def log_se3(transform: Array) -> Array:
    """SE(3) logarithm: [..., 4, 4] -> twist [..., 6] (w | v)."""
    w = log_so3(rot_of(transform))
    v_inv = jnp.linalg.inv(_v_matrix(w))
    v = jnp.einsum("...ij,...j->...i", v_inv, trans_of(transform))
    return jnp.concatenate([w, v], axis=-1)


def make_se3(rot: Array, t: Array) -> Array:
    """[..., 3, 3], [..., 3] -> [..., 4, 4]."""
    batch = jnp.broadcast_shapes(rot.shape[:-2], t.shape[:-1])
    rot = jnp.broadcast_to(rot, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rot_of(transform: Array) -> Array:
    return transform[..., :3, :3]


def trans_of(transform: Array) -> Array:
    return transform[..., :3, 3]


def inverse(transform: Array) -> Array:
    """Inverse of an SE(3) transform [..., 4, 4] (ref: datasets/math/se3.py inverse)."""
    rot = rot_of(transform)
    t = trans_of(transform)
    rot_inv = jnp.swapaxes(rot, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", rot_inv, t, precision=_HI)
    return make_se3(rot_inv, t_inv)


def concatenate(a: Array, b: Array) -> Array:
    """Composition a @ b on [..., 4, 4] (ref: datasets/math/se3.py concatenate)."""
    return jnp.matmul(a, b, precision=_HI)


def transform_points(transform: Array, points: Array, with_translate: bool = True) -> Array:
    """Apply [..., 4, 4] to row-vector points [..., n, 3].

    Ref semantics: `utils/open3d_func.py:104-131` apply_transform_*.
    """
    rot = rot_of(transform)
    out = jnp.einsum("...ij,...nj->...ni", rot, points, precision=_HI)
    if with_translate:
        out = out + trans_of(transform)[..., None, :]
    return out


def random_rotation(key: Array, max_degree: float = 360.0, max_amp: float = 3.0,
                    dtype=jnp.float32) -> Array:
    """Random SE(3): uniform axis, uniform angle in [0, max_degree], uniform
    translation direction with amplitude in [0, max_amp].

    Ref semantics: `utils/open3d_func.py:85-102` (axis & direction drawn from
    U[0,1)^3 then normalized — reproduced faithfully; note this is *not*
    uniform over SO(3), matching the reference's training distribution).
    Returns transform [4, 4].
    """
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.uniform(k1, (6,), dtype=dtype)
    degree = jax.random.uniform(k2, (), dtype=dtype) * max_degree * jnp.pi / 180.0
    amp = jax.random.uniform(k3, (), dtype=dtype) * max_amp
    w = x[:3]
    v = x[3:]
    w = w / jnp.maximum(jnp.linalg.norm(w), 1e-12) * degree
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12) * amp
    return make_se3(exp_so3(w), v)


def random_so3(key: Array, dtype=jnp.float32) -> Array:
    """Uniform random rotation matrix [3, 3] (via normalized quaternion)."""
    q = jax.random.normal(key, (4,), dtype=dtype)
    q = q / jnp.linalg.norm(q)
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        dtype=dtype,
    )


def uniform_2_sphere(key: Array, dtype=jnp.float32) -> Array:
    """Uniform point on the unit 2-sphere (ref: datasets/math/random.py:5-30)."""
    k1, k2 = jax.random.split(key)
    phi = jax.random.uniform(k1, (), dtype=dtype, minval=0.0, maxval=2 * jnp.pi)
    cos_theta = jax.random.uniform(k2, (), dtype=dtype, minval=-1.0, maxval=1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta**2, 0.0))
    return jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta])


def rotation_error_deg(gt_rot: Array, est_rot: Array,
                       orthonormalize: bool = False) -> Array:
    """RRE in degrees: acos((tr(RgᵀRe)-1)/2) (ref: deepgmr_mn40.py:152-164).

    `orthonormalize` polar-projects both inputs onto SO(3) first. The trace
    formula silently MISREADS non-orthogonality: for R·(I+E), tr < 3 reads
    as a rotation (a 5e-3 ‖E‖ reads ~6°) while tr(E) > 0 CLIPS to 0° —
    measured on round-4 map chains where bf16-precision pose products left
    ~5e-3 non-orthogonal rotations (BENCH_NOTES/ops/precision.py). Chained
    trajectory metrics should pass True; single-pair RRE keeps the
    reference's raw formula (solver outputs are Kabsch-exact rotations).
    """
    if orthonormalize:
        from ..registration.kabsch import rotation_from_h

        gt_rot = rotation_from_h(gt_rot)
        est_rot = rotation_from_h(est_rot)
    cos = (jnp.trace(jnp.matmul(jnp.swapaxes(gt_rot, -1, -2), est_rot, precision=_HI), axis1=-2, axis2=-1) - 1.0) / 2.0
    cos = jnp.clip(cos, -1.0, 1.0)
    return jnp.degrees(jnp.abs(jnp.arccos(cos)))


def translation_error(gt_t: Array, est_t: Array) -> Array:
    """RTE: ||t_gt - t_est|| (ref: deepgmr_mn40.py:163)."""
    return jnp.linalg.norm(gt_t - est_t, axis=-1)


def registration_rmse(points: Array, gt_transform: Array, est_transform: Array) -> Array:
    """Mean point distance between gt- and est-transformed clouds
    (ref: deepgmr_mn40.py:123-126)."""
    a = transform_points(est_transform, points)
    b = transform_points(gt_transform, points)
    return jnp.mean(jnp.linalg.norm(a - b, axis=-1), axis=-1)
