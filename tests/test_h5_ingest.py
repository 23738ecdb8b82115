"""Fixture tests for every real-data h5 ingest path.

The BASELINE targets are defined on these formats (DeepGMR
`{source,target,transform}` h5, ref `datasets/deepgmr_mn40.py:43-69`;
RPM-Net `modelnet40_ply_hdf5_2048` shards `{data,label[,normal]}`, ref
`datasets/mn40_hdf.py:164-258`), so the parsers must be proven on tiny
round-trip files, not just on the synthetic fallbacks.
"""
from __future__ import annotations

import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from rift_tpu.data.mn40_hdf import Mn40HdfConfig, ModelNetHdf
from rift_tpu.data.registration_pairs import H5TestPairs
from rift_tpu.data.sequences import SequenceConfig, SyntheticSequence


@pytest.fixture
def deepgmr_h5(tmp_path):
    """Tiny DeepGMR-format file: 5 pairs of 64-point clouds."""
    rs = np.random.RandomState(3)
    m, n = 5, 64
    source = rs.randn(m, n, 3).astype(np.float64)  # ref files store float64
    transform = np.tile(np.eye(4), (m, 1, 1))
    for i in range(m):
        ang = rs.uniform(0, 2 * np.pi)
        c, s = np.cos(ang), np.sin(ang)
        transform[i, :3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        transform[i, :3, 3] = rs.uniform(-0.3, 0.3, 3)
    target = (np.einsum("mij,mnj->mni", transform[:, :3, :3], source)
              + transform[:, None, :3, 3])
    path = tmp_path / "mn40_noisy.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("source", data=source)
        f.create_dataset("target", data=target)
        f.create_dataset("transform", data=transform)
    return str(path), source, target, transform


def test_h5_test_pairs_roundtrip(deepgmr_h5):
    path, source, target, transform = deepgmr_h5
    ds = H5TestPairs(path, num_points=48)
    assert len(ds) == 5
    src, dst, t = ds[2]
    assert src.shape == (48, 3) and dst.shape == (48, 3) and t.shape == (4, 4)
    assert src.dtype == np.float32 and t.dtype == np.float32
    np.testing.assert_allclose(src, source[2][:48].astype(np.float32))
    # transform convention: t maps source -> target
    np.testing.assert_allclose(
        src @ t[:3, :3].T + t[:3, 3], dst, rtol=1e-5, atol=1e-5)


def test_h5_test_pairs_batches(deepgmr_h5):
    path, *_ = deepgmr_h5
    ds = H5TestPairs(path, num_points=32)
    batches = list(ds.batches(batch_size=2))
    assert [b.transform.shape[0] for b in batches] == [2, 2, 1]
    assert batches[0].source.shape == (2, 32, 3)
    assert batches[0].source.dtype == np.float32


def _write_rpmnet_shards(root, with_normals: bool, m: int = 6, n: int = 128):
    """Two *train*/*test* shards in the modelnet40_ply_hdf5_2048 layout."""
    rs = np.random.RandomState(11)
    os.makedirs(root, exist_ok=True)
    for split in ("train", "test"):
        for shard in range(2):
            path = os.path.join(root, f"ply_data_{split}{shard}.h5")
            with h5py.File(path, "w") as f:
                f.create_dataset(
                    "data", data=rs.randn(m, n, 3).astype(np.float32))
                f.create_dataset(
                    "label", data=rs.randint(0, 40, (m, 1)).astype(np.uint8))
                if with_normals:
                    nrm = rs.randn(m, n, 3)
                    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
                    f.create_dataset("normal", data=nrm.astype(np.float32))


@pytest.mark.parametrize("with_normals", [False, True])
def test_modelnet_hdf_real_branch(tmp_path, with_normals):
    root = str(tmp_path / "mn40_hdf")
    _write_rpmnet_shards(root, with_normals)
    cfg = Mn40HdfConfig(root=root, num_points=96, mode="crop")
    ds = ModelNetHdf(cfg, split="test")
    assert len(ds) == 12  # 2 shards x 6 clouds; train shards excluded
    want_ch = 6 if with_normals else 3
    assert ds._clouds.shape == (12, 128, want_ch)

    pair = ds.get_pair(4, np.random.RandomState(0))
    src, ref, t = (pair["points_src"], pair["points_ref"],
                   pair["transform_gt"])
    assert src.shape == (96, 3) and ref.shape == (96, 3)
    assert src.dtype == np.float32 and t.dtype == np.float32
    assert t.shape == (4, 4)
    np.testing.assert_allclose(t[3], [0, 0, 0, 1], atol=0)
    assert np.allclose(t[:3, :3] @ t[:3, :3].T, np.eye(3), atol=1e-5)
    assert 0 <= pair["label"] < 40
    # transform_gt maps src -> ref: the cropped+jittered clouds stay within
    # noise_clip + crop mismatch of the transformed source's bounding box.
    moved = src @ t[:3, :3].T + t[:3, 3]
    assert np.linalg.norm(moved.mean(0) - ref.mean(0)) < 0.5


def test_modelnet_hdf_ignores_other_split(tmp_path):
    root = str(tmp_path / "mn40_hdf")
    _write_rpmnet_shards(root, with_normals=False)
    train = ModelNetHdf(Mn40HdfConfig(root=root), split="train")
    test = ModelNetHdf(Mn40HdfConfig(root=root), split="test")
    assert len(train) == 12 and len(test) == 12
    assert not np.array_equal(train._clouds[0], test._clouds[0])


def test_synthetic_sequence_h5_branch(tmp_path):
    rs = np.random.RandomState(5)
    scans = rs.randn(7, 256, 3).astype(np.float64)
    poses = np.tile(np.eye(4), (7, 1, 1))
    poses[:, :3, 3] = rs.randn(7, 3)
    path = str(tmp_path / "seq.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("scans", data=scans)
        f.create_dataset("poses", data=poses)
    seq = SyntheticSequence(SequenceConfig(path=path))
    assert len(seq) == 7
    assert seq.scans.shape == (7, 256, 3)
    assert seq.scans.dtype == np.float32
    assert seq.gt_poses.shape == (7, 4, 4)
    np.testing.assert_allclose(seq.scans, scans.astype(np.float32))
    np.testing.assert_allclose(seq.gt_poses, poses.astype(np.float32))
