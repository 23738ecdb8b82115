import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.ops import se3
from rift_tpu.ops.lrf import change_coords, global_lrf, local_lrf, pca_align


def _rand_rot(seed):
    return np.asarray(se3.random_so3(jax.random.PRNGKey(seed)))


def test_global_lrf_is_orthonormal(rng):
    pts = rng.randn(4, 100, 3).astype(np.float32)
    pts -= pts.mean(1, keepdims=True)
    basis = np.asarray(global_lrf(jnp.asarray(pts)))
    eye = np.einsum("bij,bkj->bik", basis, basis)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)
    # right-handed: det = +1 (z = x × y)
    np.testing.assert_allclose(np.linalg.det(basis), 1.0, atol=1e-4)


def test_change_coords_rotation_invariant(rng):
    pts = rng.randn(3, 200, 3).astype(np.float32)
    pts -= pts.mean(1, keepdims=True)
    rot = _rand_rot(1)
    f1 = np.asarray(change_coords(jnp.asarray(pts)))
    f2 = np.asarray(change_coords(jnp.asarray(pts @ rot.T)))
    np.testing.assert_allclose(f1, f2, atol=5e-4)


def test_change_coords_reference_loop_oracle(rng):
    """Transcription of the reference per-sample loop (pvcnn_classify.py:153-184)."""
    pts = rng.randn(150, 3).astype(np.float32)
    pts -= pts.mean(0, keepdims=True)

    norms = np.linalg.norm(pts, axis=1)
    rank = np.argsort(-norms, kind="stable")
    base_x = pts[rank[0]] / np.linalg.norm(pts[rank[0]])
    for j in range(1, len(pts)):
        base_y = pts[rank[j]]
        if np.linalg.norm(base_y) < 1e-5:
            continue
        base_y = base_y / np.linalg.norm(base_y)
        lam = np.dot(base_x, base_y)
        if -0.9 < lam < 0.9:
            break
    base_x = base_x - base_y * np.dot(base_x, base_y)
    base_x /= np.linalg.norm(base_x)
    base_z = np.cross(base_x, base_y)
    base_z /= np.linalg.norm(base_z)
    want = pts @ np.stack([base_x, base_y, base_z]).T

    got = np.asarray(change_coords(jnp.asarray(pts[None])))[0]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_local_lrf_rotation_invariant(rng):
    nbr = rng.randn(2, 16, 12, 3).astype(np.float32)
    rot = _rand_rot(2)
    f1 = np.asarray(local_lrf(jnp.asarray(nbr)))
    f2 = np.asarray(local_lrf(jnp.asarray(nbr @ rot.T)))
    np.testing.assert_allclose(f1, f2, atol=5e-4)


def test_pca_align_invariant_up_to_sign(rng):
    pts = rng.randn(1, 100, 3).astype(np.float32)
    rot = _rand_rot(3)
    f1 = np.asarray(pca_align(jnp.asarray(pts)))[0]
    f2 = np.asarray(pca_align(jnp.asarray(pts @ rot.T)))[0]
    # PCA axes have a sign ambiguity; compare per-axis up to sign
    for axis in range(3):
        d_same = np.abs(f1[:, axis] - f2[:, axis]).max()
        d_flip = np.abs(f1[:, axis] + f2[:, axis]).max()
        assert min(d_same, d_flip) < 5e-4
