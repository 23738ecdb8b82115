import math

import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.ops.spherical import (
    normalize_coords_sphere,
    spherical_avg_voxelize,
    spherical_trilinear_devoxelize,
    spherical_voxel_indices,
)


def spherical_index_oracle(coords, r):
    """Numpy transcription of spherical_vox.cu:30-76 (grid stats kernel)."""
    n = coords.shape[0]
    ind = np.zeros(n, np.int32)
    pi = math.acos(-1.0)
    for i in range(n):
        x, y, z = coords[i]
        gama = math.sqrt(x * x + y * y + z * z)
        if gama == 0 or gama >= 1 or (z / gama) > 1 or (z / gama) < -1:
            ind[i] = -1
            continue
        beta = math.acos(z / gama)
        if beta >= pi:
            ind[i] = -1
            continue
        if x == 0 and y != 0:
            alpha = (y / abs(y)) * pi * 0.5
        elif x == 0 and y == 0:
            alpha = 0.0
        else:
            alpha = math.atan(y / x) + pi * (1 - (x / abs(x))) / 2
        alpha += pi / r
        if alpha < 0:
            alpha += 2 * pi
        gx = min(int(math.floor(gama * r)), r - 1)
        gy = min(int(math.floor(alpha * r / 2 / pi)), r - 1)
        gz = min(int(math.floor(beta * r / pi)), r - 1)
        ind[i] = gx * r * r + gy * r + gz
    return ind


def test_spherical_indices_match_cuda_oracle(rng):
    r = 8
    n = 500
    coords = rng.randn(n, 3).astype(np.float32) * 0.4
    coords[0] = 0.0  # γ == 0 -> undefined
    coords[1] = [2.0, 0.0, 0.0]  # γ >= 1 -> undefined
    coords[2] = [0.0, 0.5, 0.0]  # x == 0, y > 0 branch
    coords[3] = [0.0, -0.5, 0.0]  # x == 0, y < 0 branch
    coords[4] = [0.0, 0.0, 0.3]  # on +z axis (β = 0)
    coords[5] = [0.0, 0.0, -0.3]  # on -z axis (β = π -> clamped bin)
    coords[6] = [-0.3, 0.0, 0.1]  # x < 0 branch
    inds, defined = spherical_voxel_indices(jnp.asarray(coords[None]), r)
    want = spherical_index_oracle(coords, r)
    np.testing.assert_array_equal(np.asarray(inds)[0], want)
    np.testing.assert_array_equal(np.asarray(defined)[0], want >= 0)


def test_spherical_voxelize_mean_and_undefined(rng):
    r = 4
    b, n, c = 2, 300, 6
    coords = rng.randn(b, n, 3).astype(np.float32)
    feat = rng.randn(b, n, c).astype(np.float32)
    grid, inds, norm_coords = spherical_avg_voxelize(
        jnp.asarray(feat), jnp.asarray(coords), r
    )
    assert grid.shape == (b, r, r, r, c)
    inds_np = np.asarray(inds)
    # The farthest point has γ == 1 -> undefined (reference quirk)
    nc = np.asarray(norm_coords)
    far = np.argmax(np.linalg.norm(nc, axis=-1), axis=-1)
    for i in range(b):
        assert inds_np[i, far[i]] == -1
    # Scatter-mean parity with the oracle
    flat = np.asarray(grid).reshape(b, r**3, c)
    for i in range(b):
        want = np.zeros((r**3, c), np.float32)
        cnt = np.zeros(r**3, np.int64)
        for j in range(n):
            if inds_np[i, j] >= 0:
                cnt[inds_np[i, j]] += 1
        for j in range(n):
            if inds_np[i, j] >= 0:
                want[inds_np[i, j]] += feat[i, j] / cnt[inds_np[i, j]]
        np.testing.assert_allclose(flat[i], want, atol=1e-4)


def test_spherical_devoxelize_zero_for_undefined_and_weights_sum(rng):
    r = 4
    b, n, c = 1, 100, 3
    coords = rng.randn(b, n, 3).astype(np.float32)
    feat = np.ones((b, n, c), np.float32)
    grid, inds, norm_coords = spherical_avg_voxelize(
        jnp.asarray(feat), jnp.asarray(coords), r
    )
    ones_grid = jnp.ones_like(grid)
    out = np.asarray(
        spherical_trilinear_devoxelize(ones_grid, norm_coords, inds, r)
    )
    inds_np = np.asarray(inds)
    # Interpolating a constant-1 grid must return 1 at every defined point
    # (weights sum to 1) and 0 at undefined points.
    defined = inds_np[0] >= 0
    np.testing.assert_allclose(out[0, defined], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[0, ~defined], 0.0)


def test_spherical_roundtrip_gradients(rng):
    r = 4
    b, n, c = 1, 64, 2
    coords = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    feat = jnp.asarray(rng.randn(b, n, c).astype(np.float32))

    def loss(f):
        grid, inds, nc = spherical_avg_voxelize(f, coords, r)
        out = spherical_trilinear_devoxelize(grid, nc, inds, r)
        return jnp.sum(out**2)

    g = jax.grad(loss)(feat)
    assert np.all(np.isfinite(np.asarray(g)))
    eps = 1e-2
    e = np.zeros((b, n, c), np.float32)
    e[0, 7, 0] = eps
    fd = (loss(feat + jnp.asarray(e)) - loss(feat - jnp.asarray(e))) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 7, 0]), float(fd), rtol=5e-2, atol=1e-3)


def test_normalize_coords_sphere_max_radius_one(rng):
    coords = jnp.asarray(rng.randn(3, 50, 3).astype(np.float32) * 5.0)
    nc = np.asarray(normalize_coords_sphere(coords))
    radii = np.linalg.norm(nc, axis=-1)
    np.testing.assert_allclose(radii.max(axis=-1), 1.0, atol=1e-5)
