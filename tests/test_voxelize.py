import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.ops.voxelize import (
    avg_voxelize,
    cube_voxel_indices,
    normalize_coords_cube,
    scatter_mean,
    trilinear_devoxelize,
)


def avg_voxelize_oracle(features, inds, r3):
    """Numpy transcription of vox.cu:18-73 (scatter-mean by index)."""
    n, c = features.shape
    cnt = np.zeros(r3, np.int64)
    for i in range(n):
        cnt[inds[i]] += 1
    out = np.zeros((r3, c), np.float32)
    for i in range(n):
        out[inds[i]] += features[i] / cnt[inds[i]]
    return out


def test_scatter_mean_matches_oracle(rng):
    b, n, c, s = 2, 200, 5, 27
    feat = rng.randn(b, n, c).astype(np.float32)
    inds = rng.randint(0, s, (b, n)).astype(np.int32)
    got = np.asarray(scatter_mean(jnp.asarray(feat), jnp.asarray(inds), s))
    for i in range(b):
        want = avg_voxelize_oracle(feat[i], inds[i], s)
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_scatter_mean_respects_valid_mask(rng):
    feat = jnp.asarray(rng.randn(1, 10, 2).astype(np.float32))
    inds = jnp.zeros((1, 10), jnp.int32)
    valid = jnp.asarray([[True] * 5 + [False] * 5])
    out = np.asarray(scatter_mean(feat, inds, 4, valid=valid))
    want = np.mean(np.asarray(feat)[0, :5], axis=0)
    np.testing.assert_allclose(out[0, 0], want, atol=1e-5)
    np.testing.assert_allclose(out[0, 1:], 0.0)


def test_avg_voxelize_end_to_end(rng):
    b, n, c, r = 2, 128, 4, 4
    coords = rng.randn(b, n, 3).astype(np.float32)
    feat = rng.randn(b, n, c).astype(np.float32)
    grid, inds, gc = avg_voxelize(jnp.asarray(feat), jnp.asarray(coords), r)
    assert grid.shape == (b, r, r, r, c)
    assert inds.shape == (b, n)
    # Oracle indices
    gc_np = np.asarray(normalize_coords_cube(jnp.asarray(coords), r))
    want_inds = np.asarray(cube_voxel_indices(jnp.asarray(gc_np), r))
    np.testing.assert_array_equal(np.asarray(inds), want_inds)
    # Mass check: each voxel holds the mean of its member features
    flat = np.asarray(grid).reshape(b, r**3, c)
    for i in range(b):
        want = avg_voxelize_oracle(feat[i], want_inds[i], r**3)
        np.testing.assert_allclose(flat[i], want, atol=1e-5)
    del gc


def test_trilinear_devoxelize_exact_at_integer_coords(rng):
    b, r, c = 1, 4, 3
    grid = jnp.asarray(rng.randn(b, r, r, r, c).astype(np.float32))
    # Integer grid coords must return the exact voxel value
    ij = np.array([[1, 2, 3], [0, 0, 0], [3, 3, 3]], np.float32)[None]
    out = np.asarray(trilinear_devoxelize(grid, jnp.asarray(ij), r))
    g = np.asarray(grid)
    np.testing.assert_allclose(out[0, 0], g[0, 1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], g[0, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 2], g[0, 3, 3, 3], atol=1e-6)


def test_trilinear_devoxelize_interpolates(rng):
    b, r, c = 1, 4, 1
    grid = np.zeros((b, r, r, r, c), np.float32)
    grid[0, 1, 0, 0, 0] = 1.0
    grid[0, 2, 0, 0, 0] = 3.0
    coords = np.array([[[1.25, 0.0, 0.0]]], np.float32)
    out = np.asarray(trilinear_devoxelize(jnp.asarray(grid), jnp.asarray(coords), r))
    np.testing.assert_allclose(out[0, 0, 0], 0.75 * 1.0 + 0.25 * 3.0, atol=1e-6)


def test_voxelize_gradients_flow(rng):
    b, n, c, r = 1, 32, 2, 3
    coords = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    feat = jnp.asarray(rng.randn(b, n, c).astype(np.float32))

    def loss(f):
        grid, _, gc = avg_voxelize(f, coords, r)
        out = trilinear_devoxelize(grid, gc, r)
        return jnp.sum(out**2)

    g = jax.grad(loss)(feat)
    assert np.all(np.isfinite(np.asarray(g)))
    # Finite-difference check on one element
    eps = 1e-3
    e = np.zeros((b, n, c), np.float32)
    e[0, 3, 1] = eps
    fd = (loss(feat + jnp.asarray(e)) - loss(feat - jnp.asarray(e))) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 3, 1]), float(fd), rtol=3e-2, atol=1e-3)
