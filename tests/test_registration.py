import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rift_tpu.ops import se3
from rift_tpu.registration import (
    gnc_pose,
    icp_pose,
    pair_errors,
    ransac_pose,
    register_pair,
    weighted_kabsch,
)


def _random_pair(rng, n=200, noise=0.0, outlier_frac=0.0, seed=5):
    src = rng.randn(n, 3).astype(np.float32)
    t = np.asarray(se3.random_rotation(jax.random.PRNGKey(seed), max_amp=0.5))
    dst = src @ t[:3, :3].T + t[:3, 3]
    if noise:
        dst = dst + rng.randn(n, 3).astype(np.float32) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        dst[:n_out] = rng.randn(n_out, 3).astype(np.float32) * 2.0
    return src, dst.astype(np.float32), t


def test_kabsch_exact_recovery(rng):
    src, dst, t = _random_pair(rng)
    est = np.asarray(weighted_kabsch(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(est, t, atol=1e-4)


def test_kabsch_weighted_ignores_outliers(rng):
    src, dst, t = _random_pair(rng, outlier_frac=0.3)
    w = np.ones(len(src), np.float32)
    w[: int(0.3 * len(src))] = 0.0
    est = np.asarray(
        weighted_kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    )
    np.testing.assert_allclose(est, t, atol=1e-4)


def test_kabsch_reflection_guard(rng):
    # Coplanar points can induce reflections; det(R) must stay +1
    src = rng.randn(50, 3).astype(np.float32)
    src[:, 2] = 0.0
    dst = -src  # a reflection-ish target
    est = np.asarray(weighted_kabsch(jnp.asarray(src), jnp.asarray(dst)))
    assert np.linalg.det(est[:3, :3]) > 0.99


@pytest.mark.parametrize("kind", ["tls", "gm"])
def test_gnc_robust_to_outliers(rng, kind):
    src, dst, t = _random_pair(rng, noise=0.005, outlier_frac=0.4)
    est, w = gnc_pose(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(len(src), bool),
        noise_bound=0.02 if kind == "tls" else 0.05, kind=kind,
    )
    est = np.asarray(est)
    err = pair_errors(jnp.asarray(src[None]), jnp.asarray(t[None]),
                      jnp.asarray(est[None]))
    assert float(err["rre"][0]) < 2.0, float(err["rre"][0])
    assert float(err["rte"][0]) < 0.05


def test_gnc_tls_early_exit_bitwise_matches_full_scan(rng):
    """The while_loop fixed-point exit must be bitwise identical to the
    reference-parameter fixed 100-iteration schedule, including under vmap
    (the batched eval path)."""
    from functools import partial

    from rift_tpu.registration.gnc import _residuals
    from rift_tpu.registration.kabsch import weighted_kabsch as wk

    @partial(jax.jit, static_argnames=("max_iterations",))
    def gnc_tls_full_scan(src, dst, valid, noise_bound=0.02, gnc_factor=1.4,
                          max_iterations=100):
        c2 = noise_bound * noise_bound
        w0 = valid.astype(src.dtype)
        t0 = wk(src, dst, w0)
        r2_max = jnp.max(jnp.where(valid, _residuals(t0, src, dst) ** 2, 0.0))
        mu0 = jnp.maximum(c2 / jnp.maximum(2.0 * r2_max - c2, 1e-12), 1e-6)

        def step(carry, _):
            transform, mu = carry
            r2 = _residuals(transform, src, dst) ** 2
            th1 = (mu + 1.0) / mu * c2
            th2 = mu / (mu + 1.0) * c2
            w = jnp.where(
                r2 >= th1, 0.0,
                jnp.where(r2 <= th2, 1.0,
                          jnp.sqrt(c2 * mu * (mu + 1.0)
                                   / jnp.maximum(r2, 1e-20)) - mu))
            w = w * valid
            return (wk(src, dst, w), mu * gnc_factor), w

        (transform, _), ws = jax.lax.scan(step, (t0, mu0), None,
                                          length=max_iterations)
        return transform, ws[-1]

    srcs, dsts = [], []
    for seed in range(4):
        src, dst, _ = _random_pair(rng, noise=0.005,
                                   outlier_frac=0.1 * seed, seed=seed)
        srcs.append(src)
        dsts.append(dst)
    srcs = jnp.asarray(np.stack(srcs))
    dsts = jnp.asarray(np.stack(dsts))
    valid = jnp.ones(srcs.shape[:2], bool)

    t_fast, w_fast = jax.vmap(gnc_pose)(srcs, dsts, valid)
    t_full, w_full = jax.vmap(gnc_tls_full_scan)(srcs, dsts, valid)
    np.testing.assert_array_equal(np.asarray(t_fast), np.asarray(t_full))
    np.testing.assert_array_equal(np.asarray(w_fast), np.asarray(w_full))


def test_ransac_robust_to_outliers(rng):
    src, dst, t = _random_pair(rng, noise=0.003, outlier_frac=0.5)
    est, inl = ransac_pose(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst),
        jnp.ones(len(src), bool), num_hypotheses=256,
    )
    err = pair_errors(jnp.asarray(src[None]), jnp.asarray(t[None]),
                      jnp.asarray(np.asarray(est)[None]))
    assert float(err["rre"][0]) < 2.0
    assert float(err["rte"][0]) < 0.05
    # inliers should exclude most outliers
    assert np.asarray(inl)[: int(0.5 * len(src))].mean() < 0.2


def test_icp_refines_small_perturbation(rng):
    src, dst, t = _random_pair(rng, noise=0.0)
    # ICP from identity only works for small motions; make one
    t_small = np.asarray(se3.make_se3(
        se3.exp_so3(jnp.asarray([0.05, -0.03, 0.02])), jnp.asarray([0.02, 0.01, -0.01])
    ))
    dst_small = src @ t_small[:3, :3].T + t_small[:3, 3]
    est = np.asarray(icp_pose(jnp.asarray(src), jnp.asarray(dst_small.astype(np.float32))))
    np.testing.assert_allclose(est, t_small, atol=1e-3)


@pytest.mark.parametrize("method", ["teaserpp", "ransac", "fgr"])
def test_register_pair_end_to_end_with_perfect_features(rng, method):
    """With distinctive features, the full pipeline recovers the pose."""
    src, dst, t = _random_pair(rng, noise=0.002)
    # features: the source coordinates themselves (same for both clouds ->
    # mutual NN gives identity correspondence)
    feat = rng.randn(len(src), 16).astype(np.float32)
    est, _ = register_pair(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(feat), jnp.asarray(feat),
        key=jax.random.PRNGKey(1), method=method,
    )
    err = pair_errors(jnp.asarray(src[None]), jnp.asarray(t[None]),
                      jnp.asarray(np.asarray(est)[None]))
    assert float(err["rre"][0]) < 1.0, (method, float(err["rre"][0]))
    assert float(err["rte"][0]) < 0.02
    assert float(err["rmse"][0]) < 0.05


def test_rotation_from_h_matches_svd_formula(rng):
    from rift_tpu.registration.kabsch import rotation_from_h

    def svd_rot(h):
        # classic formula (for max tr(R h)): R = V diag(1,1,det(VU^T)) U^T
        u, s, vt = np.linalg.svd(h)
        v = vt.T
        d = np.linalg.det(v @ u.T)
        return v @ np.diag([1.0, 1.0, d]) @ u.T

    cases = [rng.randn(3, 3).astype(np.float32) for _ in range(20)]
    # coplanar (rank 2) and collinear (rank 1) and reflection-heavy cases
    a = rng.randn(3, 2).astype(np.float32)
    cases.append((a @ rng.randn(2, 3).astype(np.float32)))
    b = rng.randn(3, 1).astype(np.float32)
    cases.append(b @ rng.randn(1, 3).astype(np.float32))
    cases.append(np.diag([2.0, 1.5, -1.0]).astype(np.float32))
    for h in cases:
        # rotation_from_h maximizes tr(R^T h) == tr(R h^T); align conventions
        got = np.asarray(rotation_from_h(jnp.asarray(h.T)))
        want = svd_rot(h)
        # compare objective values (optima may differ in degenerate null dirs)
        np.testing.assert_allclose(np.trace(got @ h), np.trace(want @ h),
                                   atol=1e-3)
        # and verify got is a proper rotation
        np.testing.assert_allclose(got @ got.T, np.eye(3), atol=1e-4)
        assert np.linalg.det(got) > 0.99


@pytest.mark.parametrize("method", ["ransac+icp", "teaserpp+icp"])
def test_register_pair_icp_refinement_tightens_pose(rng, method):
    """'+icp' composite: dense geometric polish from the robust init beats
    the correspondence-only estimate on noisy matches."""
    src, dst, t = _random_pair(rng, noise=0.0)
    # features noisy enough that mutual-NN has some wrong matches
    feat = (src + rng.randn(*src.shape).astype(np.float32) * 0.02)
    feat2 = (src + rng.randn(*src.shape).astype(np.float32) * 0.02)
    args = (jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(feat), jnp.asarray(feat2))
    raw, _ = register_pair(*args, key=jax.random.PRNGKey(0),
                           method=method.removesuffix("+icp"))
    ref, _ = register_pair(*args, key=jax.random.PRNGKey(0), method=method)
    def rre(est):
        err = pair_errors(jnp.asarray(src[None]), jnp.asarray(t[None]),
                          jnp.asarray(np.asarray(est)[None]))
        return float(err["rre"][0])
    assert rre(ref) <= rre(raw) + 1e-6, (rre(ref), rre(raw))
    assert rre(ref) < 0.5, rre(ref)


def test_icp_plane_beats_point_on_resampled_planes(rng):
    """Independently-sampled planar surfaces: point-to-point ICP has a
    sampling-mismatch bias floor; point-to-plane converges to the pose."""
    from rift_tpu.registration.icp import icp_plane_pose

    def sample_scene(n):
        # two orthogonal planes (floor + wall), like a room corner
        m = n // 2
        floor = np.stack([rng.rand(m) * 2 - 1, rng.rand(m) * 2 - 1,
                          np.zeros(m)], -1)
        wall = np.stack([rng.rand(n - m) * 2 - 1, np.full(n - m, -1.0),
                         rng.rand(n - m)], -1)
        return np.concatenate([floor, wall]).astype(np.float32)

    src = sample_scene(512)
    dst0 = sample_scene(512)  # SAME surfaces, different sample points
    t_small = np.asarray(se3.make_se3(
        se3.exp_so3(jnp.asarray([0.02, 0.01, -0.03])),
        jnp.asarray([0.03, -0.02, 0.01])), dtype=np.float32)
    dst = dst0 @ t_small[:3, :3].T + t_small[:3, 3]
    normals = np.where(dst0[:, 2:3] == 0.0,
                       np.array([[0.0, 0, 1]]), np.array([[0.0, 1, 0]]))
    normals = (normals @ t_small[:3, :3].T).astype(np.float32)

    est_pt = np.asarray(icp_pose(jnp.asarray(src), jnp.asarray(dst)))
    est_pl = np.asarray(icp_plane_pose(jnp.asarray(src), jnp.asarray(dst),
                                       jnp.asarray(normals)))

    def rot_err(est):
        c = (np.trace(t_small[:3, :3].T @ est[:3, :3]) - 1) / 2
        return np.degrees(np.arccos(np.clip(c, -1, 1)))

    assert rot_err(est_pl) < 0.05, rot_err(est_pl)
    assert rot_err(est_pl) < rot_err(est_pt), (rot_err(est_pl), rot_err(est_pt))


def test_register_pair_picp_runs(rng):
    src, dst, t = _random_pair(rng, noise=0.002)
    feat = rng.randn(len(src), 16).astype(np.float32)
    est, _ = register_pair(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(feat),
        jnp.asarray(feat), key=jax.random.PRNGKey(1), method="ransac+picp")
    err = pair_errors(jnp.asarray(src[None]), jnp.asarray(t[None]),
                      jnp.asarray(np.asarray(est)[None]))
    assert float(err["rre"][0]) < 1.0


def test_gnc_tls_scan_toggle_matches_while_loop(rng):
    """The public early_exit=False toggle (fixed-length lax.scan) must
    reproduce the while-loop fixed point end to end (bench bisect toggle,
    registration/gnc.py; the inline-oracle variant of this property is
    test_gnc_tls_early_exit_bitwise_matches_full_scan)."""
    src, dst, _ = _random_pair(rng, noise=0.005, outlier_frac=0.3)
    valid = jnp.ones(src.shape[0], bool)
    t_while, w_while = gnc_pose(jnp.asarray(src), jnp.asarray(dst), valid)
    t_scan, w_scan = gnc_pose(jnp.asarray(src), jnp.asarray(dst), valid,
                              early_exit=False)
    np.testing.assert_allclose(np.asarray(t_while), np.asarray(t_scan),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(w_while) > 0.5,
                                  np.asarray(w_scan) > 0.5)


def test_f32_geometry_context_applies():
    """Solver entry points run under HIGHEST matmul precision (the TPU
    default feeds bf16 into pose products — ops/precision.py)."""
    import jax

    from rift_tpu.ops.precision import f32_geometry

    @f32_geometry
    def probe():
        return jax.config.jax_default_matmul_precision

    assert probe() == "highest"


def test_solver_outputs_are_orthogonal_rotations(rng):
    """Every estimator + composite must emit R in SO(3) to fp accuracy:
    non-orthogonal pose products were the round-4 root cause of chained
    trajectory-metric distortion (transpose-as-inverse amplifies ||RtR-I||
    with chain length)."""
    import jax
    import jax.numpy as jnp

    from rift_tpu.registration.pipeline import register_pair_from_matches

    src = jnp.asarray(rng.randn(128, 3).astype(np.float32) * 0.4)
    a = rng.randn(3); a /= np.linalg.norm(a)
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    R = (np.eye(3) + np.sin(0.7) * K + (1 - np.cos(0.7)) * K @ K
         ).astype(np.float32)
    dst = src @ R.T + jnp.asarray(rng.randn(128, 3).astype(np.float32)) * 0.01
    idx = jnp.arange(128, dtype=jnp.int32)
    for method in ("teaserpp", "ransac", "fgr", "ransac+picp", "ransac+pl",
                   "teaserpp+icp"):
        T, _ = register_pair_from_matches(
            src, dst, idx, idx, jnp.ones(128, bool),
            key=jax.random.PRNGKey(0), method=method, num_hypotheses=64,
            noise_bound=0.05)
        Rm = np.asarray(T)[:3, :3]
        assert np.abs(Rm.T @ Rm - np.eye(3)).max() < 1e-5, method
        assert abs(np.linalg.det(Rm) - 1.0) < 1e-5, method


def test_teaser_pose_survives_extreme_outlier_rate(rng):
    """The TEASER depth (compatibility core + TIM decoupling) must solve
    correspondence sets where plain GNC-TLS from a contaminated Kabsch
    init fails — the low-overlap regime (VERDICT r4 weak #3)."""
    from rift_tpu.registration.gnc import compatibility_core, teaser_pose

    n, inl = 200, 40  # 80% structured-ish outliers
    src = rng.randn(n, 3).astype(np.float32)
    t = np.asarray(se3.random_rotation(jax.random.PRNGKey(3), max_amp=0.5))
    dst = src @ t[:3, :3].T + t[:3, 3]
    dst[inl:] = rng.randn(n - inl, 3).astype(np.float32) * 1.5 + 0.5
    dst += rng.randn(n, 3).astype(np.float32) * 0.005
    valid = jnp.ones(n, bool)
    nb = 0.02

    keep, deg = compatibility_core(jnp.asarray(src), jnp.asarray(dst),
                                   valid, nb)
    keep_np = np.asarray(keep)
    # the core keeps mostly true inliers
    assert keep_np[:inl].sum() >= 0.8 * inl
    assert keep_np[inl:].sum() <= 0.1 * (n - inl)

    est, w = teaser_pose(jnp.asarray(src), jnp.asarray(dst), valid,
                         noise_bound=nb)
    err = pair_errors(jnp.asarray(src)[None], jnp.asarray(t)[None],
                      est[None])
    assert float(err["rre"][0]) < 2.0, float(err["rre"][0])
    assert float(err["rte"][0]) < 0.05, float(err["rte"][0])


def test_teaser_pose_matches_gnc_on_clean(rng):
    """With clean correspondences the full pipeline must not regress the
    plain GNC-TLS result."""
    from rift_tpu.registration.gnc import teaser_pose

    src, dst, t = _random_pair(rng, n=128, noise=0.002)
    valid = jnp.ones(src.shape[0], bool)
    est_t, _ = teaser_pose(jnp.asarray(src), jnp.asarray(dst), valid,
                           noise_bound=0.02)
    est_g, _ = gnc_pose(jnp.asarray(src), jnp.asarray(dst), valid,
                        noise_bound=0.02)
    for est in (est_t, est_g):
        err = pair_errors(jnp.asarray(src)[None], jnp.asarray(t)[None],
                          est[None])
        assert float(err["rre"][0]) < 1.0
        assert float(err["rte"][0]) < 0.02


def test_teaser_pose_vmaps(rng):
    from rift_tpu.registration.gnc import teaser_pose

    srcs, dsts, ts = [], [], []
    for i in range(3):
        s, d, t = _random_pair(rng, n=64, noise=0.002, outlier_frac=0.4,
                               seed=i)
        srcs.append(s); dsts.append(d); ts.append(t)
    src = jnp.asarray(np.stack(srcs))
    dst = jnp.asarray(np.stack(dsts))
    valid = jnp.ones(src.shape[:2], bool)
    est, w = jax.vmap(lambda s, d, v: teaser_pose(s, d, v, noise_bound=0.02)
                      )(src, dst, valid)
    err = pair_errors(src, jnp.asarray(np.stack(ts)), est)
    assert float(jnp.max(err["rre"])) < 2.0, np.asarray(err["rre"])
