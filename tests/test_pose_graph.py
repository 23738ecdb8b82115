import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rift_tpu.ops import se3
from rift_tpu.parallel import make_mesh
from rift_tpu.registration.bundle_adjust import bundle_adjust, bundle_adjust_sharded
from rift_tpu.registration.pose_graph import (
    optimize_pose_graph,
    optimize_pose_graph_sharded,
    trajectory_ate,
)


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.randn(16, 6).astype(np.float32) * 0.5)
    t = se3.exp_se3(xi)
    back = se3.log_se3(t)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-4)


def _make_trajectory(rng, n, drift=0.05, closure_drift=None):
    """Ground-truth chain of poses + noisy odometry and loop-closure edges.

    Odometry edges (i, i+1) carry `drift` noise; loop closures carry
    `closure_drift` (default: drift / 10 — the realistic SLAM setting where
    global registration anchors a drifting chain)."""
    closure_drift = drift / 10.0 if closure_drift is None else closure_drift
    gt = [np.eye(4, dtype=np.float32)]
    for _ in range(n - 1):
        xi = np.concatenate([rng.randn(3) * 0.2, rng.randn(3) * 0.3])
        gt.append(gt[-1] @ np.asarray(se3.exp_se3(jnp.asarray(xi, jnp.float32))))
    gt = np.stack(gt)
    edges = [(i, i + 1, drift) for i in range(n - 1)]  # odometry
    edges += [(i, i + 2, closure_drift) for i in range(0, n - 2, 2)]
    edges.append((0, n - 1, closure_drift))
    i_idx = np.asarray([e[0] for e in edges], np.int32)
    j_idx = np.asarray([e[1] for e in edges], np.int32)
    meas = []
    for a, b, sigma in edges:
        rel = np.linalg.inv(gt[a]) @ gt[b]
        noise = np.concatenate([rng.randn(3) * sigma * 0.2, rng.randn(3) * sigma])
        meas.append(rel @ np.asarray(se3.exp_se3(jnp.asarray(noise, jnp.float32))))
    return gt, i_idx, j_idx, np.stack(meas).astype(np.float32)


def test_pose_graph_reduces_ate(rng):
    n = 8
    gt, i_idx, j_idx, meas = _make_trajectory(rng, n, drift=0.03)
    # initialize by chaining noisy odometry only
    init = [gt[0]]
    for k in range(n - 1):
        init.append(init[-1] @ meas[k])
    init = jnp.asarray(np.stack(init))
    ate_before = float(trajectory_ate(jnp.asarray(gt), init))
    opt = optimize_pose_graph(init, jnp.asarray(i_idx), jnp.asarray(j_idx),
                              jnp.asarray(meas), num_iterations=10)
    ate_after = float(trajectory_ate(jnp.asarray(gt), opt))
    assert ate_after < ate_before * 0.8, (ate_before, ate_after)
    assert ate_after < 0.1


def test_pose_graph_exact_measurements_recover_gt(rng):
    n = 6
    gt, i_idx, j_idx, meas_noisy = _make_trajectory(rng, n, drift=0.0)
    init = jnp.asarray(np.stack(
        [gt[k] @ np.asarray(se3.exp_se3(jnp.asarray(
            np.concatenate([rng.randn(3) * 0.05, rng.randn(3) * 0.05]),
            jnp.float32))) for k in range(n)]
    ))
    init = init.at[0].set(jnp.asarray(gt[0]))
    opt = optimize_pose_graph(init, jnp.asarray(i_idx), jnp.asarray(j_idx),
                              jnp.asarray(meas_noisy), num_iterations=15)
    assert float(trajectory_ate(jnp.asarray(gt), opt)) < 1e-3


def test_pose_graph_sharded_matches_single(rng):
    n = 6
    gt, i_idx, j_idx, meas = _make_trajectory(rng, n, drift=0.02)
    # pad edges to a multiple of 8 (mesh size) with zero-weight self-edges
    e = len(i_idx)
    pad = (-e) % 8
    i_p = np.concatenate([i_idx, np.zeros(pad, np.int32)])
    j_p = np.concatenate([j_idx, np.zeros(pad, np.int32)])
    m_p = np.concatenate([meas, np.tile(np.eye(4, dtype=np.float32), (pad, 1, 1))])
    w_p = np.concatenate([np.ones(e, np.float32), np.zeros(pad, np.float32)])
    init = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * n))
    single = optimize_pose_graph(init, jnp.asarray(i_p), jnp.asarray(j_p),
                                 jnp.asarray(m_p), jnp.asarray(w_p),
                                 num_iterations=8)
    mesh = make_mesh()
    sharded = optimize_pose_graph_sharded(
        init, jnp.asarray(i_p), jnp.asarray(j_p), jnp.asarray(m_p),
        jnp.asarray(w_p), mesh, num_iterations=8,
    )
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded), atol=1e-3)


def _make_ba_problem(rng, num_poses=4, num_landmarks=64, k=3, noise=0.01):
    gt_poses = [np.eye(4, dtype=np.float32)]
    for _ in range(num_poses - 1):
        xi = np.concatenate([rng.randn(3) * 0.1, rng.randn(3) * 0.3])
        gt_poses.append(gt_poses[-1] @ np.asarray(se3.exp_se3(jnp.asarray(xi, jnp.float32))))
    gt_poses = np.stack(gt_poses)
    gt_lms = rng.randn(num_landmarks, 3).astype(np.float32) * 2.0
    obs_pose = np.stack([rng.choice(num_poses, k, replace=False)
                         for _ in range(num_landmarks)]).astype(np.int32)
    obs_local = np.zeros((num_landmarks, k, 3), np.float32)
    for l in range(num_landmarks):
        for q in range(k):
            t = gt_poses[obs_pose[l, q]]
            local = (np.linalg.inv(t) @ np.append(gt_lms[l], 1.0))[:3]
            obs_local[l, q] = local + rng.randn(3) * noise
    return gt_poses, gt_lms, obs_pose, obs_local


def test_bundle_adjust_converges(rng):
    gt_poses, gt_lms, obs_pose, obs_local = _make_ba_problem(rng, noise=0.0)
    # perturb everything except pose 0
    init_poses = gt_poses.copy()
    for i in range(1, len(gt_poses)):
        xi = np.concatenate([rng.randn(3) * 0.05, rng.randn(3) * 0.1])
        init_poses[i] = gt_poses[i] @ np.asarray(se3.exp_se3(jnp.asarray(xi, jnp.float32)))
    init_lms = gt_lms + rng.randn(*gt_lms.shape).astype(np.float32) * 0.1
    poses, lms = bundle_adjust(
        jnp.asarray(init_poses), jnp.asarray(init_lms),
        jnp.asarray(obs_pose), jnp.asarray(obs_local), num_iterations=15,
    )
    ate = float(trajectory_ate(jnp.asarray(gt_poses), poses))
    lm_err = float(jnp.abs(lms - jnp.asarray(gt_lms)).max())
    assert ate < 1e-3, ate
    assert lm_err < 1e-2, lm_err


@pytest.mark.slow
def test_bundle_adjust_sharded_matches_single(rng):
    gt_poses, gt_lms, obs_pose, obs_local = _make_ba_problem(rng, noise=0.01)
    init_lms = gt_lms + rng.randn(*gt_lms.shape).astype(np.float32) * 0.05
    args = (jnp.asarray(gt_poses), jnp.asarray(init_lms),
            jnp.asarray(obs_pose), jnp.asarray(obs_local))
    p1, l1 = bundle_adjust(*args, num_iterations=5)
    mesh = make_mesh()
    p2, l2 = bundle_adjust_sharded(*args, mesh, num_iterations=5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-3)


def test_bundle_adjust_outliers_bounded_influence(rng):
    """Half the observations point at WRONG physical points (the failure
    mode of low-inlier correspondence sets): Huber IRLS + the cost guard
    must keep BA from dragging near-correct poses away, while the same
    problem without robustness degrades them."""
    gt_poses, gt_lms, obs_pose, obs_local = _make_ba_problem(
        rng, num_landmarks=96, noise=0.005)
    bad = rng.rand(*obs_pose.shape) < 0.5
    obs_local = np.where(bad[..., None],
                         obs_local + rng.randn(*obs_local.shape) * 0.5,
                         obs_local).astype(np.float32)
    args = (jnp.asarray(gt_poses), jnp.asarray(gt_lms),
            jnp.asarray(obs_pose), jnp.asarray(obs_local))
    p_rob, _ = bundle_adjust(*args, num_iterations=10, huber_delta=0.05)
    p_naive, _ = bundle_adjust(*args, num_iterations=10, huber_delta=None)
    ate_rob = float(trajectory_ate(jnp.asarray(gt_poses), p_rob))
    ate_naive = float(trajectory_ate(jnp.asarray(gt_poses), p_naive))
    # δ=0.05 Huber still admits linear influence from the corrupted half,
    # so a small drift remains — but bounded (vs ~0.12 naive on this seed).
    assert ate_rob < 0.03, (ate_rob, ate_naive)
    assert ate_rob <= ate_naive + 1e-6, (ate_rob, ate_naive)


def test_build_landmarks_gates(rng):
    """max_residual drops far-off matches; min_edge_inliers drops whole
    low-confidence edges."""
    from rift_tpu.registration.sequence import build_landmarks

    n = 32
    scans = rng.randn(2, n, 3).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    i_idx = np.array([0], np.int32)
    j_idx = np.array([1], np.int32)
    corr_idx2 = np.arange(n, dtype=np.int32)[None]
    corr_w = np.ones((1, n), np.float32)
    meas = np.eye(4, dtype=np.float32)[None]
    # identical scans -> residuals 0 except 8 poisoned columns
    scans[1] = scans[0]
    scans[1, :8] += 1.0
    _, obs_pose, _ = build_landmarks(scans, poses, i_idx, j_idx, corr_idx2,
                                     corr_w, meas, per_edge=n,
                                     max_residual=0.5)
    assert (obs_pose >= 0).all(axis=-1).sum() == n - 8
    # low inlier fraction -> whole edge gated
    corr_w_low = np.zeros((1, n), np.float32)
    corr_w_low[0, :2] = 1.0  # 6% inliers
    _, obs_pose2, _ = build_landmarks(scans, poses, i_idx, j_idx, corr_idx2,
                                      corr_w_low, meas, per_edge=n,
                                      min_edge_inliers=0.10)
    assert (obs_pose2 < 0).all()
