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


def test_pca_lrf_rotation_equivariant(rng):
    """basis(R·x) == basis(x) · Rᵀ -> canonical coords rotation-invariant."""
    from rift_tpu.ops.lrf import pca_lrf

    pts = (rng.randn(2, 200, 3) * np.array([2.0, 1.0, 0.5])
           + rng.rand(2, 1, 3)).astype(np.float32)
    pts[..., 0] += 0.3 * pts[..., 0] ** 2 * np.sign(pts[..., 0])  # skew
    rot = _rand_rot(2)  # one [3, 3] rotation applied to both batch items
    b1 = np.asarray(pca_lrf(jnp.asarray(pts)))
    b2 = np.asarray(pca_lrf(jnp.asarray(np.einsum("ij,bnj->bni", rot, pts))))
    c1 = np.einsum("bij,bnj->bni", b1, pts - pts.mean(1, keepdims=True))
    c2 = np.einsum("bij,bnj->bni", b2, np.einsum(
        "ij,bnj->bni", rot, pts - pts.mean(1, keepdims=True)))
    np.testing.assert_allclose(c1, c2, atol=2e-3)
    # proper rotations
    for b in b1:
        np.testing.assert_allclose(b @ b.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(b) > 0.99


def test_pca_lrf_resample_stable(rng):
    """Two independent samplings of the same asymmetric surface land in
    (nearly) the same frame — the property the reference LRF lacks."""
    from rift_tpu.ops.lrf import pca_lrf

    base = rng.randn(4096, 3) * np.array([2.0, 1.0, 0.5])
    base[:, 0] += 0.3 * base[:, 0] ** 2 * np.sign(base[:, 0])
    a = base[rng.choice(4096, 1024, replace=False)].astype(np.float32)
    b = base[rng.choice(4096, 1024, replace=False)].astype(np.float32)
    ba = np.asarray(pca_lrf(jnp.asarray(a)))
    bb = np.asarray(pca_lrf(jnp.asarray(b)))
    m = ba @ bb.T
    ang = np.degrees(np.arccos(np.clip((np.trace(m) - 1) / 2, -1, 1)))
    assert ang < 3.0, ang


def test_lrf_flip_hypotheses_group(rng):
    """4 hypotheses: all proper rotations, first = identity flip, and they
    differ pairwise by the three 180° axis rotations."""
    from rift_tpu.ops.lrf import lrf_flip_hypotheses, pca_lrf

    pts = rng.randn(150, 3).astype(np.float32)
    basis = pca_lrf(jnp.asarray(pts))
    hyp = np.asarray(lrf_flip_hypotheses(basis))
    assert hyp.shape == (4, 3, 3)
    np.testing.assert_allclose(hyp[0], np.asarray(basis), atol=0)
    for h in hyp:
        np.testing.assert_allclose(h @ h.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(h) > 0.99
    rels = {tuple(np.round(np.diag(h @ hyp[0].T)).astype(int)) for h in hyp}
    assert rels == {(1, 1, 1), (1, -1, -1), (-1, 1, -1), (-1, -1, 1)}


def test_consensus_match_recovers_flip(rng):
    """Feed source features under 4 flips where only hypothesis 2 matches
    the target's frame: consensus must select it and produce the clean
    matches."""
    from rift_tpu.ops.lrf import lrf_flip_hypotheses, pca_lrf
    from rift_tpu.registration.consensus import consensus_match

    src = (rng.randn(128, 3) * np.array([2.0, 1.0, 0.5])).astype(np.float32)
    dst = src.copy()  # identical cloud, identity transform
    basis = pca_lrf(jnp.asarray(src))
    hyp = lrf_flip_hypotheses(basis)
    # 'features' = canonical coords under each hypothesis; target uses hyp 2
    f_src_h = jnp.einsum("hij,nj->hni", hyp, jnp.asarray(src))
    f_dst = jnp.einsum("ij,nj->ni", hyp[2], jnp.asarray(dst))
    i1, i2, mask, h = consensus_match(
        jnp.asarray(src), jnp.asarray(dst), f_src_h, f_dst, tau=0.02)
    assert int(h) == 2
    assert bool(jnp.all(i1[mask] == i2[mask]))
    assert int(mask.sum()) == 128
