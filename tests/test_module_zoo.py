"""Tests for the module-zoo completeness components: frustum box loss,
RPM-Net hdf pipeline, 4-class reflection labels, knn_select combos."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rift_tpu.ops.frustum import frustum_pointnet_loss, get_box_corners_3d
from rift_tpu.ops.neighbors import knn_select
from rift_tpu.data.mn40_hdf import Mn40HdfConfig, ModelNetHdf
from rift_tpu.data.modelnet40_4class import reflection_label
from rift_tpu.train.meters import MeterReflection, MeterRPMNet


def test_box_corners_axis_aligned():
    centers = jnp.array([[1.0, 2.0, 3.0]])
    sizes = jnp.array([[2.0, 4.0, 6.0]])  # l, w, h
    corners = get_box_corners_3d(centers, jnp.zeros(1), sizes)
    assert corners.shape == (1, 3, 8)
    c = np.asarray(corners[0])
    # extents: x spans l, y spans h, z spans w, centered on `centers`
    np.testing.assert_allclose(c[0].max() - c[0].min(), 2.0, atol=1e-6)
    np.testing.assert_allclose(c[1].max() - c[1].min(), 6.0, atol=1e-6)
    np.testing.assert_allclose(c[2].max() - c[2].min(), 4.0, atol=1e-6)
    np.testing.assert_allclose(c.mean(axis=1), [1.0, 2.0, 3.0], atol=1e-6)


def test_box_corners_flip_is_pi_rotation():
    centers = jnp.zeros((2, 3))
    sizes = jnp.ones((2, 3)) * jnp.array([2.0, 1.0, 0.5])
    headings = jnp.array([0.3, -1.2])
    base, flip = get_box_corners_3d(centers, headings, sizes, with_flip=True)
    direct = get_box_corners_3d(centers, headings + jnp.pi, sizes)
    np.testing.assert_allclose(np.asarray(flip), np.asarray(direct), atol=1e-5)


def _frustum_fixtures(rs, b=4, n=32, nh=12, ns=3, perfect=True):
    bins = np.arange(0, 2 * np.pi, 2 * np.pi / nh).astype(np.float32)
    templates = np.abs(rs.randn(ns, 3)).astype(np.float32) + 0.5
    targets = {
        "mask_logits": rs.randint(0, 2, (b, n)),
        "center": rs.randn(b, 3).astype(np.float32),
        "heading_bin_id": rs.randint(0, nh, (b,)),
        "heading_residual": (rs.rand(b).astype(np.float32) - 0.5) * 0.1,
        "size_template_id": rs.randint(0, ns, (b,)),
        "size_residual": rs.randn(b, 3).astype(np.float32) * 0.05,
    }
    onehot2 = np.eye(2, dtype=np.float32)[targets["mask_logits"]]  # [b,n,2]
    hr = np.zeros((b, nh), np.float32)
    hr[np.arange(b), targets["heading_bin_id"]] = targets["heading_residual"]
    sr = np.zeros((b, ns, 3), np.float32)
    sr[np.arange(b), targets["size_template_id"]] = targets["size_residual"]
    inputs = {
        "mask_logits": np.transpose(onehot2, (0, 2, 1)) * 20.0,
        "center": targets["center"].copy(),
        "center_reg": targets["center"].copy(),
        "heading_scores": np.eye(nh, dtype=np.float32)[targets["heading_bin_id"]] * 20.0,
        "heading_residuals_normalized": hr / (np.pi / nh),
        "heading_residuals": hr,
        "size_scores": np.eye(ns, dtype=np.float32)[targets["size_template_id"]] * 20.0,
        "size_residuals_normalized": sr / templates[targets["size_template_id"]][:, None],
        "size_residuals": sr,
    }
    if not perfect:
        inputs = {k: v + rs.randn(*np.shape(v)).astype(np.float32)
                  for k, v in inputs.items()}
    inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
    targets = {k: jnp.asarray(v) for k, v in targets.items()}
    return inputs, targets, jnp.asarray(bins), jnp.asarray(templates)


def test_frustum_loss_perfect_below_noisy():
    rs = np.random.RandomState(0)
    inputs, targets, bins, templates = _frustum_fixtures(rs, perfect=True)
    good = float(frustum_pointnet_loss(inputs, targets, bins, templates))
    rs = np.random.RandomState(0)
    inputs, targets, bins, templates = _frustum_fixtures(rs, perfect=False)
    bad = float(frustum_pointnet_loss(inputs, targets, bins, templates))
    assert np.isfinite(good) and np.isfinite(bad)
    assert good < 0.1, good  # perfect predictions -> only label-smoothing slack
    assert bad > good


def test_frustum_loss_jits_and_grads():
    rs = np.random.RandomState(1)
    inputs, targets, bins, templates = _frustum_fixtures(rs, perfect=False)
    fn = jax.jit(lambda i: frustum_pointnet_loss(i, targets, bins, templates))
    g = jax.grad(lambda i: frustum_pointnet_loss(i, targets, bins, templates))(inputs)
    assert np.isfinite(float(fn(inputs)))
    assert all(np.all(np.isfinite(np.asarray(v))) for v in g.values())


@pytest.mark.parametrize("mode", ["clean", "jitter", "crop"])
def test_mn40_hdf_pairs(mode):
    ds = ModelNetHdf(Mn40HdfConfig(num_points=256, mode=mode,
                                   synthetic_items=4), split="test")
    assert len(ds) == 4
    rs = np.random.RandomState(0)
    pair = ds.get_pair(0, rs)
    assert pair["points_src"].shape == (256, 3)
    assert pair["points_ref"].shape == (256, 3)
    t = pair["transform_gt"]
    rot = t[:3, :3]
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-5)
    # gt transform aligns src onto ref (chamfer-close; independent samples)
    aligned = pair["points_src"] @ rot.T + t[:3, 3]
    d = np.linalg.norm(aligned[:, None] - pair["points_ref"][None], axis=-1)
    tol = 0.25 if mode == "crop" else 0.1
    assert float(d.min(1).mean()) < tol


def test_reflection_label_identity_and_range():
    rs = np.random.RandomState(0)
    src = rs.randn(200, 3) * np.array([3.0, 2.0, 1.0])
    assert reflection_label(src, src.copy(), np.eye(3)) == 0
    # reflected first axis in the *rotation estimate* flips the label bits
    from rift_tpu.data.transforms import random_rotation
    t, dst = random_rotation(src, None, rs=rs)
    label = reflection_label(src, dst, t[:3, :3])
    assert label in (0, 1, 2, 3)


def test_knn_select_combos():
    rs = np.random.RandomState(0)
    a = jnp.asarray(rs.randn(50, 3).astype(np.float32))
    b = jnp.asarray(rs.randn(40, 3).astype(np.float32))
    d1, d2, i1, i2 = knn_select(a, b, 4)
    assert d1.shape == (50, 4) and d2.shape == (40, 4)
    assert i1.shape == (50, 4) and i2.shape == (40, 4)
    d1_only, i1_only = knn_select(a, b, 4, bilateral=False)
    np.testing.assert_allclose(np.asarray(d1_only), np.asarray(d1))
    only_idx = knn_select(a, b, 4, bilateral=False, return_distance=False)
    np.testing.assert_array_equal(np.asarray(only_idx), np.asarray(i1))


def test_modelnet40_fourclass_dataset():
    from rift_tpu.data.modelnet40 import ModelNet40Config
    from rift_tpu.data.modelnet40_4class import ModelNet40FourClass

    ds = ModelNet40FourClass(
        ModelNet40Config(num_points=128,
                         synthetic_items={"train": 4, "valid": 2, "test": 2}),
        "train")
    rs = np.random.RandomState(0)
    cloud, (label, four) = ds.get(0, rs)
    assert cloud.shape == (128, 6)
    assert 0 <= four <= 3 and isinstance(label, int)


def test_meters_rpmnet_and_reflection():
    m = MeterRPMNet()
    m.update({k: np.full((2,), 4.0) for k in MeterRPMNet.KEYS})
    out = m.compute()
    assert out["r_mse"] == 2.0 and out["err_r_deg"] == 4.0  # rmse vs mean
    r = MeterReflection()
    r.update(np.eye(4)[[0, 1]], np.array([[7, 0], [7, 2]]))
    assert r.compute()["reflect_acc"] == 0.5
