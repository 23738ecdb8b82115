import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rift_tpu.models import PointNetClassifier, PVCNNClassifier, ShapeNetPVCNN

TINY_BLOCKS = ((8, 1, 4), (16, 1, None))


def _init_and_apply(model, x, train=False):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    out, mutated = model.apply(
        variables, x, train=train,
        mutable=["batch_stats"] if train else [],
        rngs={"dropout": jax.random.PRNGKey(2)} if train else {},
    )
    return out, variables, mutated


@pytest.mark.parametrize("voxel_shape,kernel", [
    ("spherical", "dgcnn_kernel"),
    ("cube", "pointnet_kernel"),
])
def test_classifier_forward_shapes(rng, voxel_shape, kernel):
    model = PVCNNClassifier(
        blocks=TINY_BLOCKS, dim_k=16, num_classes=40,
        point_kernel_formal=kernel, voxel_shape=voxel_shape,
        rot_invariant_preprocess="change_coords", with_local_feat="ppf",
        local_neighbors=8, with_coeff=True, with_se=True,
    )
    x = jnp.asarray(rng.randn(2, 32, 6).astype(np.float32))
    out, _, _ = _init_and_apply(model, x)
    assert out.shape == (2, 40)
    assert np.all(np.isfinite(np.asarray(out)))


def test_feature_extractor_mode(rng):
    model = PVCNNClassifier(
        blocks=TINY_BLOCKS, dim_k=16, num_classes=40, is_classify=False,
        rot_invariant_preprocess="change_coords", with_local_feat="ppf",
        extra_feature_channels=4, local_neighbors=8,
    )
    x = jnp.asarray(rng.randn(2, 32, 6).astype(np.float32))
    out, _, _ = _init_and_apply(model, x)
    assert out.shape == (2, 32, 16)


@pytest.mark.parametrize("preprocess", ["ppf", "new_ppf", "pca", None])
def test_classifier_all_preprocess_modes(rng, preprocess):
    model = PVCNNClassifier(
        blocks=TINY_BLOCKS, dim_k=16, num_classes=10,
        rot_invariant_preprocess=preprocess, with_local_feat=None,
    )
    x = jnp.asarray(rng.randn(2, 32, 6).astype(np.float32))
    out, _, _ = _init_and_apply(model, x)
    assert out.shape == (2, 10)


def test_classifier_train_mode_updates_batch_stats(rng):
    model = PVCNNClassifier(
        blocks=TINY_BLOCKS, dim_k=16, num_classes=10,
        rot_invariant_preprocess="change_coords", with_local_feat=None,
    )
    x = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32))
    out, variables, mutated = _init_and_apply(model, x, train=True)
    assert "batch_stats" in mutated
    leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(np.abs(np.asarray(leaf)).sum() > 0 for leaf in leaves)


def test_shapenet_segmentation_shapes(rng):
    model = ShapeNetPVCNN(
        blocks=TINY_BLOCKS, num_classes=50, num_shapes=16,
        rot_invariant_preprocess="change_coords", with_local_feat=False,
    )
    x = rng.randn(2, 32, 6 + 16).astype(np.float32)
    out, _, _ = _init_and_apply(model, jnp.asarray(x))
    assert out.shape == (2, 32, 50)


def test_pointnet_classifier(rng):
    model = PointNetClassifier(mlp=(16, 32), num_classes=40, rot_invariant="pca")
    x = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32))
    out, _, _ = _init_and_apply(model, x)
    assert out.shape == (2, 40)


def test_per_point_features_invariant_end_to_end(rng):
    """Registration-mode trunk with canonical voxel coords: per-point
    features of an exactly-rotated copy must match point-for-point (the
    premise of two-stage registration). Requires BOTH the raw-frame local
    features (the reference mixes canonical coords with world normals when
    use_new_coords_for_voxel=True) and equivariant normal estimation."""
    import jax

    from rift_tpu.ops import se3
    from rift_tpu.ops.neighbors import mutual_nearest_neighbors
    from rift_tpu.ops.normals import estimate_normals

    model = PVCNNClassifier(
        blocks=TINY_BLOCKS, dim_k=16, is_classify=False,
        point_kernel_formal="dgcnn_kernel", voxel_shape="spherical",
        rot_invariant_preprocess="change_coords", with_local_feat="ppf",
        extra_feature_channels=4, local_neighbors=16,
        use_new_coords_for_voxel=True,
    )
    n = 128
    pts = rng.randn(n, 3).astype(np.float32)
    pts[:, 0] += 0.8 * (pts[:, 1] > 0)  # break point symmetry
    pts -= pts.mean(0)
    t = np.asarray(se3.random_rotation(jax.random.PRNGKey(5), max_amp=0.0))
    moved = pts @ t[:3, :3].T

    both = jnp.asarray(np.stack([pts, moved]))
    x = jnp.concatenate([both, estimate_normals(both)], -1)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    feats = model.apply(variables, x, train=False)
    i1, i2, mask = mutual_nearest_neighbors(feats[0], feats[1])
    i2, mask = np.asarray(i2), np.asarray(mask)
    correct = ((i2 == np.arange(n)) & mask).sum() / max(mask.sum(), 1)
    assert mask.mean() > 0.95, mask.mean()
    assert correct > 0.95, correct
