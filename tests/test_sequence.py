"""Multi-scan sequence pipeline (north star): synthetic indoor trajectory ->
pairwise registration -> odometry -> pose graph -> BA -> ATE."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rift_tpu.data.sequences import (SequenceConfig, SyntheticSequence,
                                     make_room_scene)
from rift_tpu.registration.sequence import (build_edges, map_sequence,
                                            odometry_from_measurements)


def _oracle_features(seq: SyntheticSequence) -> np.ndarray:
    """World coordinates as 'perfect descriptors': nearest physical point
    across scans = nearest feature. Exercises matching + GNC + graph + BA
    without a trained net."""
    feats = []
    for scan, pose in zip(seq.scans, seq.gt_poses):
        feats.append(scan @ pose[:3, :3].T + pose[:3, 3])
    return np.stack(feats).astype(np.float32)


def test_build_edges():
    i_idx, j_idx = build_edges(10, loop_stride=4)
    cons = [(a, b) for a, b in zip(i_idx, j_idx) if b == a + 1]
    loops = [(a, b) for a, b in zip(i_idx, j_idx) if b == a + 4]
    assert len(cons) == 9
    assert loops == [(0, 4), (2, 6), (4, 8)]


def test_room_scene_and_trajectory():
    scene = make_room_scene(4096, seed=1)
    assert scene.shape[1] == 3 and np.isfinite(scene).all()
    seq = SyntheticSequence(SequenceConfig(num_scans=6, num_points=256,
                                           scene_points=4096))
    assert seq.scans.shape == (6, 256, 3)
    # poses are rigid transforms
    rots = seq.gt_poses[:, :3, :3]
    eye = np.einsum("nij,nkj->nik", rots, rots)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(rots), 1.0, atol=1e-5)
    # relative_gt algebra: M_ij = T_j^-1 T_i
    m = seq.relative_gt(1, 3)
    np.testing.assert_allclose(
        m, np.linalg.inv(seq.gt_poses[3]) @ seq.gt_poses[1], atol=1e-6)


def test_odometry_chaining_exact():
    seq = SyntheticSequence(SequenceConfig(num_scans=5, num_points=128,
                                           scene_points=2048))
    i_idx, j_idx = build_edges(5, loop_stride=0)
    meas = np.stack([seq.relative_gt(int(a), int(b))
                     for a, b in zip(i_idx, j_idx)])
    odom = odometry_from_measurements(5, i_idx, j_idx, meas)
    # gauge: odometry starts at I; compare relative to gt gauge
    gt = seq.gt_poses
    aligned = np.einsum("ij,njk->nik", gt[0], odom)
    np.testing.assert_allclose(aligned, gt, atol=1e-4)


def test_map_sequence_oracle_features_monotonic_ate():
    """e2e with oracle descriptors: ATE improves odometry -> graph, and BA
    does not regress it. (VERDICT r1 item 4 'done' criterion, >=20 scans.)"""
    seq = SyntheticSequence(SequenceConfig(num_scans=20, num_points=512,
                                           scene_points=8192, seed=3))
    feats = _oracle_features(seq)
    res = map_sequence(seq.scans, feats, gt_poses=seq.gt_poses,
                       noise_bound=0.08, loop_stride=5,
                       landmarks_per_edge=32, batch_edges=8)
    m = res.metrics
    assert m["mean_edge_inliers"] > 0.2, m
    assert m["ate_graph"] <= m["ate_odometry"] * 1.02, m
    assert m["ate_ba"] <= m["ate_graph"] * 1.05, m
    assert m["ate_ba"] < 0.05, m


@pytest.mark.slow
def test_map_sequence_sharded_matches_single():
    """Edge-sharded pose graph + landmark-sharded BA on the 8-device CPU
    mesh reproduce the single-device result (psum reassociation only).

    Fixture deliberately tiny (T=8 scans, 128 points — VERDICT r4 #10):
    the gates exercised are sharding equivalence, not map quality, and the
    runtime is compile-dominated."""
    from rift_tpu.parallel.mesh import make_mesh

    seq = SyntheticSequence(SequenceConfig(num_scans=8, num_points=128,
                                           scene_points=2048, seed=4))
    feats = _oracle_features(seq)
    # gate_rounds=0: the sharded-vs-single equivalence doesn't exercise the
    # prior-gated re-matching, and the extra registration pass + graph
    # solve were doubling this test's compile-dominated runtime.
    # ransac/nh=64: the equivalence gate is about the sharded solves, not
    # the edge estimator; the default teaserpp program would add minutes
    # of n²-compatibility-map compilation per variant.
    kwargs = dict(gt_poses=seq.gt_poses, noise_bound=0.08, loop_stride=4,
                  landmarks_per_edge=16, batch_edges=8, seed=0,
                  gate_rounds=0, method="ransac", num_hypotheses=64)
    single = map_sequence(seq.scans, feats, **kwargs)
    mesh = make_mesh()
    sharded = map_sequence(seq.scans, feats, mesh=mesh, **kwargs)
    np.testing.assert_allclose(sharded.graph, single.graph, atol=1e-3)
    np.testing.assert_allclose(sharded.ba, single.ba, atol=1e-3)
    assert abs(sharded.metrics["ate_ba"] - single.metrics["ate_ba"]) < 1e-3


def test_gated_mutual_nn_contract(rng):
    from rift_tpu.ops.neighbors import (gated_mutual_nearest_neighbors,
                                        mutual_nearest_neighbors)

    f1 = jnp.asarray(rng.randn(32, 8).astype(np.float32))
    f2 = jnp.asarray(rng.randn(32, 8).astype(np.float32))
    all_true = jnp.ones((32, 32), bool)
    a = mutual_nearest_neighbors(f1, f2)
    b = gated_mutual_nearest_neighbors(f1, f2, all_true)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # a gate that forbids everything masks every match out
    none = jnp.zeros((32, 32), bool)
    _, _, mask = gated_mutual_nearest_neighbors(f1, f2, none)
    assert int(mask.sum()) == 0
    # gate restricted to the true diagonal forces identity matching
    eye = jnp.eye(32, dtype=bool)
    _, i2, mask = gated_mutual_nearest_neighbors(f1, f1, eye)
    assert bool(jnp.all(i2 == jnp.arange(32)))
    assert int(mask.sum()) == 32


def test_gated_register_edges_rescues_featureless_matching():
    """Motion-prior-gated matching (VERDICT r3 #5 mechanism): with features
    carrying NO correspondence signal, ungated mutual-NN gives garbage
    edges, while a prior-centered spatial gate bounds every putative match
    to the gate ball, so the robust solve lands near the prior."""
    from rift_tpu.registration.sequence import register_edges

    rs = np.random.RandomState(0)
    seq = SyntheticSequence(SequenceConfig(
        num_scans=5, num_points=256, scene_points=4096, crop=True, seed=3))
    feats = rs.randn(5, 256, 8).astype(np.float32)  # pure noise features
    i_idx, j_idx = build_edges(5, loop_stride=0)
    gt_rel = np.stack([seq.relative_gt(int(a), int(b))
                       for a, b in zip(i_idx, j_idx)])

    def edge_rre(meas):
        out = []
        for e in range(len(meas)):
            c = (np.trace(gt_rel[e][:3, :3].T @ meas[e][:3, :3]) - 1) / 2
            out.append(np.degrees(np.arccos(np.clip(c, -1, 1))))
        return np.asarray(out)

    args = dict(method="teaserpp", num_hypotheses=64, seed=0)
    m_free, _, _, _ = register_edges(
        jnp.asarray(seq.scans), jnp.asarray(feats), i_idx, j_idx, **args)
    m_gate, _, _, _ = register_edges(
        jnp.asarray(seq.scans), jnp.asarray(feats), i_idx, j_idx,
        priors=gt_rel, spatial_gate=0.2, **args)
    assert np.mean(edge_rre(m_gate)) < np.mean(edge_rre(m_free)) / 2
    assert np.mean(edge_rre(m_gate)) < 5.0


def test_map_sequence_refresh_hits_inlier_target():
    """Transform-refreshed correspondences + gauge-invariant step metric:
    on the crop sequence with surface-ambiguous features (the VALIDATION_r03
    failure structure), the map pipeline must reach the VERDICT r3 #5
    targets: mean_edge_inliers >= 0.25 and mean step RRE < 2 deg, and the
    gated round must never make things worse (monotone merge)."""
    seq = SyntheticSequence(SequenceConfig(
        num_scans=6, num_points=256, scene_points=4096, crop=True, seed=3))
    feats = []
    for scan, pose in zip(seq.scans, seq.gt_poses):
        w = scan @ pose[:3, :3].T + pose[:3, 3]
        feats.append(np.stack([w[:, 2], 0.05 * w[:, 0], 0.05 * w[:, 1]], -1))
    feats = np.stack(feats).astype(np.float32)

    def run(gate_rounds):
        return map_sequence(seq.scans, feats, gt_poses=seq.gt_poses,
                            method="teaserpp", loop_stride=4,
                            landmarks_per_edge=16, num_hypotheses=64,
                            spatial_gate=0.3, gate_rounds=gate_rounds,
                            seed=0)

    base = run(0)
    gated = run(1)
    assert gated.metrics["mean_edge_inliers"] >= 0.25
    assert gated.metrics["mean_step_rre"] < 2.0
    assert gated.metrics["mean_edge_rre"] < 2.0
    assert gated.metrics["mean_edge_inliers"] >= base.metrics[
        "mean_edge_inliers"] - 1e-6
    assert gated.metrics["ate_ba"] <= base.metrics["ate_ba"] * 1.05 + 1e-4


def test_merge_landmarks_associates_multiview():
    """Voxel association turns per-edge 2-view landmarks into multi-view
    landmarks (>=3 observing poses) and dedups per-pose observations."""
    from rift_tpu.registration.sequence import merge_landmarks

    # (coordinates kept inside one voxel cell: association is voxel
    # hashing, so boundary-straddling points may legitimately not merge)
    lms = np.array([[0.01, 0.01, 0.01], [0.011, 0.011, 0.01],  # same point
                    [1.0, 0.0, 0.0],                           # distinct
                    [0.012, 0.009, 0.01]], np.float32)         # same again
    obs_pose = np.array([[0, 1], [1, 2], [0, 3], [2, 3]], np.int32)
    obs_local = np.arange(4 * 2 * 3, dtype=np.float32).reshape(4, 2, 3)
    m_lm, m_op, m_ol = merge_landmarks(lms, obs_pose, obs_local, 0.05)
    assert m_lm.shape[0] == 2
    # the merged cluster must see poses {0, 1, 2, 3} (pose 1 deduped)
    fan = sorted(p for p in m_op[np.argmin(np.abs(m_lm[:, 0]))] if p >= 0)
    assert fan == [0, 1, 2, 3]
    # invalid rows pass through
    e_lm, e_op, e_ol = merge_landmarks(
        np.zeros((2, 3), np.float32), -np.ones((2, 2), np.int32),
        np.zeros((2, 2, 3), np.float32), 0.05)
    assert e_op.shape == (2, 2)
