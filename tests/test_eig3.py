import jax.numpy as jnp
import numpy as np

from rift_tpu.ops.eig3 import eigh_sym3, eigvals_sym3, smallest_eigenvector_sym3


def _random_sym(rng, n):
    m = rng.randn(n, 3, 3).astype(np.float32)
    return (m + np.swapaxes(m, -1, -2)) / 2


def test_eigvals_match_numpy(rng):
    a = _random_sym(rng, 200)
    l0, l1, l2 = eigvals_sym3(jnp.asarray(a))
    got = np.stack([np.asarray(l0), np.asarray(l1), np.asarray(l2)], -1)
    want = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_smallest_eigenvector_matches_numpy(rng):
    a = _random_sym(rng, 200)
    v = np.asarray(smallest_eigenvector_sym3(jnp.asarray(a)))
    want_vals, want_vecs = np.linalg.eigh(a)
    want = want_vecs[..., :, 0]
    # sign-agnostic comparison
    dots = np.abs(np.sum(v * want, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)
    # Rayleigh quotient equals smallest eigenvalue
    rq = np.einsum("ni,nij,nj->n", v, a, v)
    np.testing.assert_allclose(rq, want_vals[:, 0], atol=2e-3)


def test_eigh_sym3_full(rng):
    a = _random_sym(rng, 100)
    vals, vecs = eigh_sym3(jnp.asarray(a))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    want_vals = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(vals, want_vals, atol=2e-4)
    # A v = λ v for each column
    for k in range(3):
        av = np.einsum("nij,nj->ni", a, vecs[..., k])
        lv = vals[..., k:k+1] * vecs[..., k]
        np.testing.assert_allclose(av, lv, atol=5e-3)
    # orthonormal columns
    eye = np.einsum("nij,nik->njk", vecs, vecs)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-3)


def test_degenerate_matrices():
    # zero matrix and scaled identity: any unit vector is valid; must be finite
    a = jnp.stack([jnp.zeros((3, 3)), 2.0 * jnp.eye(3)])
    v = np.asarray(smallest_eigenvector_sym3(a))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-6)


def test_component_eigenvector_matches_matrix_form(rng):
    from rift_tpu.ops.eig3 import (smallest_eigenvector_sym3,
                                   smallest_eigenvector_sym3_components)

    h = rng.randn(64, 3, 3).astype(np.float32)
    a = h + np.swapaxes(h, -1, -2)
    aj = jnp.asarray(a)
    v_mat = np.asarray(smallest_eigenvector_sym3(aj))
    vx, vy, vz = smallest_eigenvector_sym3_components(
        aj[..., 0, 0], aj[..., 0, 1], aj[..., 0, 2],
        aj[..., 1, 1], aj[..., 1, 2], aj[..., 2, 2])
    v_cmp = np.stack([np.asarray(vx), np.asarray(vy), np.asarray(vz)], -1)
    # same eigvector up to sign
    dot = np.abs(np.sum(v_mat * v_cmp, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)
