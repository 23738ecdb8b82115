import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.ops import se3


def test_exp_log_roundtrip(rng):
    w = rng.randn(8, 3).astype(np.float32)
    rot = se3.exp_so3(jnp.asarray(w))
    # Valid rotations
    eye = np.einsum("bij,bkj->bik", np.asarray(rot), np.asarray(rot))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    w_back = np.asarray(se3.log_so3(rot))
    # log∘exp is identity modulo 2π wrap; keep angles < π
    small = w * 0.5
    rot2 = se3.exp_so3(jnp.asarray(small))
    np.testing.assert_allclose(np.asarray(se3.log_so3(rot2)), small, atol=1e-4)
    del w_back


def test_inverse_and_compose(rng):
    key = jax.random.PRNGKey(0)
    t = se3.random_rotation(key)
    ident = np.asarray(se3.concatenate(t, se3.inverse(t)))
    np.testing.assert_allclose(ident, np.eye(4), atol=1e-5)


def test_transform_points_matches_numpy(rng):
    pts = rng.randn(4, 100, 3).astype(np.float32)
    t = np.asarray(se3.random_rotation(jax.random.PRNGKey(1)))
    out = np.asarray(se3.transform_points(jnp.asarray(t), jnp.asarray(pts)))
    expected = pts @ t[:3, :3].T + t[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_error_metrics(rng):
    key = jax.random.PRNGKey(2)
    rot = se3.random_so3(key)
    assert float(se3.rotation_error_deg(rot, rot)) < 1e-3
    # Known-angle rotation about z
    theta = np.deg2rad(30.0)
    rz = jnp.asarray(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]],
        dtype=jnp.float32,
    )
    err = float(se3.rotation_error_deg(jnp.eye(3), rz))
    assert abs(err - 30.0) < 1e-3
    assert abs(float(se3.translation_error(jnp.zeros(3), jnp.ones(3))) - np.sqrt(3)) < 1e-5


def test_registration_rmse_zero_for_equal_transforms(rng):
    pts = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))
    t = se3.random_rotation(jax.random.PRNGKey(3))
    t2 = jnp.stack([t, t])
    assert float(jnp.max(se3.registration_rmse(pts, t2, t2))) < 1e-6


def test_rotation_error_orthonormalize_fixes_trace_distortion(rng):
    """The raw trace formula misreads non-orthogonality (round-4 finding):
    R(I+E) with tr(E)<0 reads degrees of phantom rotation; with tr(E)>0 it
    clips real error to 0. The orthonormalize flag polar-projects first."""
    import jax.numpy as jnp

    from rift_tpu.ops.se3 import rotation_error_deg

    a = rng.randn(3); a /= np.linalg.norm(a)
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    R = (np.eye(3) + np.sin(0.5) * K + (1 - np.cos(0.5)) * K @ K
         ).astype(np.float32)
    shrink = (R * (1.0 - 2e-3)).astype(np.float32)   # tr(E) < 0
    raw = float(rotation_error_deg(jnp.asarray(R), jnp.asarray(shrink)))
    fixed = float(rotation_error_deg(jnp.asarray(R), jnp.asarray(shrink),
                                     orthonormalize=True))
    assert raw > 1.0          # phantom degrees from pure scaling
    assert fixed < 1e-2       # same rotation after polar projection
