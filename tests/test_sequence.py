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


def test_map_sequence_sharded_matches_single():
    """Edge-sharded pose graph + landmark-sharded BA on the 8-device CPU
    mesh reproduce the single-device result (psum reassociation only)."""
    from rift_tpu.parallel.mesh import make_mesh

    seq = SyntheticSequence(SequenceConfig(num_scans=12, num_points=256,
                                           scene_points=4096, seed=4))
    feats = _oracle_features(seq)
    kwargs = dict(gt_poses=seq.gt_poses, noise_bound=0.08, loop_stride=4,
                  landmarks_per_edge=16, batch_edges=8, seed=0)
    single = map_sequence(seq.scans, feats, **kwargs)
    mesh = make_mesh()
    sharded = map_sequence(seq.scans, feats, mesh=mesh, **kwargs)
    np.testing.assert_allclose(sharded.graph, single.graph, atol=1e-3)
    np.testing.assert_allclose(sharded.ba, single.ba, atol=1e-3)
    assert abs(sharded.metrics["ate_ba"] - single.metrics["ate_ba"]) < 1e-3
