import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.ops.normals import estimate_normals
from rift_tpu.ops.sampling import furthest_point_sample, gather, random_choice


def fps_oracle(pts, m, start=0):
    n = pts.shape[0]
    min_d2 = np.full(n, np.inf)
    idx = np.zeros(m, np.int64)
    last = start
    for i in range(m):
        idx[i] = last
        d2 = np.sum((pts - pts[last]) ** 2, axis=1)
        min_d2 = np.minimum(min_d2, d2)
        last = int(np.argmax(min_d2))
    return idx


def test_fps_matches_oracle(rng):
    pts = rng.randn(100, 3).astype(np.float32)
    got = np.asarray(furthest_point_sample(jnp.asarray(pts), 10))
    want = fps_oracle(pts, 10)
    np.testing.assert_array_equal(got, want)


def test_fps_batched(rng):
    pts = rng.randn(3, 50, 3).astype(np.float32)
    got = np.asarray(furthest_point_sample(jnp.asarray(pts), 8, start_idx=2))
    for b in range(3):
        np.testing.assert_array_equal(got[b], fps_oracle(pts[b], 8, start=2))


def test_gather(rng):
    feat = rng.randn(2, 10, 4).astype(np.float32)
    idx = rng.randint(0, 10, (2, 6))
    out = np.asarray(gather(jnp.asarray(feat), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(out[b], feat[b, idx[b]])


def test_random_choice_shapes():
    key = jax.random.PRNGKey(0)
    a = np.asarray(random_choice(key, 100, 30))
    assert len(set(a.tolist())) == 30  # without replacement
    b = np.asarray(random_choice(key, 10, 30))
    assert b.shape == (30,) and b.max() < 10


def test_estimate_normals_on_plane(rng):
    # Points on the z=0.5 plane; normals must be ±z, oriented towards origin
    xy = rng.rand(200, 2).astype(np.float32) * 0.5
    pts = np.concatenate([xy, np.full((200, 1), 0.5, np.float32)], axis=1)
    normals = np.asarray(estimate_normals(jnp.asarray(pts[None]), radius=0.2))[0]
    np.testing.assert_allclose(np.abs(normals[:, 2]), 1.0, atol=1e-3)
    # camera at origin is below the plane -> normals point to -z... towards origin
    assert np.all(normals[:, 2] < 0)


def test_estimate_normals_equivariant_on_sparse_cloud(rng):
    """Hybrid search keeps normals rotation-EQUIVARIANT even where a fixed
    radius finds <3 neighbors (rank-deficient covariance used to give an
    arbitrary eigenvector that silently rotated with nothing)."""
    import jax.numpy as jnp

    from rift_tpu.ops import se3
    from rift_tpu.ops.normals import estimate_normals

    # sparse: 200 points on a unit sphere -> typical spacing >> 0.1
    import jax

    u = rng.randn(200, 3).astype(np.float32)
    pts = u / np.linalg.norm(u, axis=-1, keepdims=True)
    t = np.asarray(se3.random_rotation(jax.random.PRNGKey(3), max_amp=0.0))
    R = t[:3, :3]
    n1 = np.asarray(estimate_normals(jnp.asarray(pts[None])))[0]
    n2 = np.asarray(estimate_normals(jnp.asarray((pts @ R.T)[None])))[0]
    err = np.linalg.norm(n1 @ R.T - n2, axis=-1)
    assert np.median(err) < 1e-3
    assert (err > 0.1).mean() < 0.02, (err > 0.1).mean()


def test_exact_kth_smallest_equals_full_topk(rng):
    """The hierarchical kth selection must be bitwise identical to the full
    top_k (it feeds the hybrid-radius normal search whose exactness the
    round-3 equivariance analysis depends on)."""
    import jax
    import jax.numpy as jnp

    from rift_tpu.ops.normals import _exact_kth_smallest

    d2 = jnp.asarray(np.abs(rng.randn(4, 128, 128)).astype(np.float32))
    for k in (1, 3, 16):
        ref = -jax.lax.top_k(-d2, k)[0][..., -1:]
        got = _exact_kth_smallest(d2, k, groups=16)
        assert bool(jnp.all(got == ref))
    # indivisible fallback path
    d2_odd = d2[..., :127]
    got = _exact_kth_smallest(d2_odd, 5, groups=16)
    ref = -jax.lax.top_k(-d2_odd, 5)[0][..., -1:]
    assert bool(jnp.all(got == ref))


def test_normals_pallas_matches_xla(rng):
    """Fused moments kernel (interpret mode) == XLA matmul-moment path,
    including coincident points and the hybrid-radius expansion."""
    from rift_tpu.ops.normals import estimate_normals

    pts = rng.randn(2, 256, 3).astype(np.float32) * 0.3
    pts[0, 1] = pts[0, 0]          # duplicate point
    pts[1, :20] = pts[1, 0]        # 20 coincident points (empty bracket)
    pts_j = jnp.asarray(pts)
    ref = estimate_normals(pts_j, impl="xla")
    fast = estimate_normals(pts_j, impl="pallas")
    assert np.isfinite(np.asarray(fast)).all()
    # Same plane fits up to sign — except where the neighborhood is
    # rank-deficient (cloud 1's 20 coincident points leave some
    # neighborhoods with < 3 distinct positions: the smallest-eigenvector
    # problem has a null space and both answers are valid). Exclude
    # near-degenerate fits via the eigenvalue gap.
    from rift_tpu.ops.eig3 import eigvals_sym3
    from rift_tpu.ops.pallas.normals_kernel import neighborhood_moments_pallas

    s1, s2, cnt = neighborhood_moments_pallas(pts_j, 16, 0.01,
                                              interpret=True)
    mu = np.asarray(s1) / np.asarray(cnt)[..., None]
    cov = (np.asarray(s2) / np.asarray(cnt)[..., None, None]
           - mu[..., :, None] * mu[..., None, :])
    lam = np.sort(np.stack([np.asarray(v) for v in
                            eigvals_sym3(jnp.asarray(cov))], axis=-1),
                  axis=-1)
    well_posed = (lam[..., 1] - lam[..., 0]) > 1e-6
    assert well_posed.mean() > 0.9
    dot = np.abs(np.sum(np.asarray(ref) * np.asarray(fast), axis=-1))
    np.testing.assert_allclose(dot[well_posed], 1.0, atol=1e-4)
    # equivariance smoke: rotated copy -> rotated normals (pallas path)
    th = 0.8
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    rot = estimate_normals(jnp.asarray(pts @ R.T), impl="pallas")
    dot2 = np.abs(np.sum(np.asarray(rot) * (np.asarray(fast) @ R.T),
                         axis=-1))
    assert float(np.mean(dot2 > 0.999)) > 0.95


def test_normals_moments_kernel_counts(rng):
    from rift_tpu.ops.pallas.normals_kernel import neighborhood_moments_pallas

    pts = jnp.asarray(rng.randn(1, 256, 3).astype(np.float32))
    s1, s2, cnt = neighborhood_moments_pallas(pts, 16, 0.01, interpret=True)
    # every point has at least k=16 neighbors (hybrid expansion) incl self
    assert float(jnp.min(cnt)) >= 16
    # s2 symmetric
    np.testing.assert_allclose(np.asarray(s2),
                               np.asarray(jnp.swapaxes(s2, -1, -2)),
                               rtol=1e-5)
