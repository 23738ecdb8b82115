"""Oracle tests for the factorized vox/devox path (ops/factored_vox.py):
must match the XLA scatter/gather reference implementations bit-tightly in
f32, including undefined (-1) points, boundary clamps, the periodic α wrap,
and the custom-VJP gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.ops import spherical as sph
from rift_tpu.ops import voxelize as vox
from rift_tpu.ops.factored_vox import (
    corner_gather_diff,
    corner_gather_factored,
    corner_scatter_factored,
    scatter_mean_diff,
    scatter_mean_factored,
)
from rift_tpu.ops.pallas.spherical_fast import spherical_weight_planes

R = 8
B, N, C = 2, 64, 5


def _clouds(rng):
    pts = rng.randn(B, N, 3).astype(np.float32)
    # force some undefined spherical points: exact center + far point
    pts[0, 0] = pts[0].mean(0)
    feat = rng.randn(B, N, C).astype(np.float32)
    return jnp.asarray(pts), jnp.asarray(feat)


def test_scatter_mean_factored_matches_oracle(rng):
    pts, feat = _clouds(rng)
    nc = sph.normalize_coords_sphere(pts)
    inds, defined = sph.spherical_voxel_indices(nc, R)
    oracle = sph.scatter_mean(feat, jnp.where(defined, inds, 0), R**3,
                              valid=defined)
    out, cnt = scatter_mean_factored(feat, jnp.where(defined, inds, -1), R)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               rtol=1e-5, atol=1e-5)
    # counts: exact integers
    ref_cnt = np.zeros((B, R**3), np.float32)
    for b in range(B):
        for i in range(N):
            if bool(defined[b, i]):
                ref_cnt[b, int(inds[b, i])] += 1
    np.testing.assert_array_equal(np.asarray(cnt), ref_cnt)


def test_spherical_devox_factored_matches_oracle(rng):
    pts, feat = _clouds(rng)
    grid, inds, nc = sph.spherical_avg_voxelize(feat, pts, R)
    oracle = sph.spherical_trilinear_devoxelize(grid, nc, inds, R)
    w_hi, w_lo = spherical_weight_planes(nc, inds, R)
    flat = grid.reshape(B, R**3, C)
    out = corner_gather_factored(flat, w_hi, w_lo, R)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               rtol=1e-5, atol=1e-5)
    # undefined rows must be exactly zero
    undef = np.asarray(inds) < 0
    assert undef.any()
    assert np.all(np.asarray(out)[undef] == 0.0)


def test_cube_vox_devox_factored_matches_oracle(rng):
    pts, feat = _clouds(rng)
    grid_o, inds_o, gc_o = vox.avg_voxelize(feat, pts, R)
    grid_f, inds_f, gc_f = vox.avg_voxelize_fast(feat, pts, R)
    np.testing.assert_array_equal(np.asarray(inds_o), np.asarray(inds_f))
    np.testing.assert_allclose(np.asarray(grid_f), np.asarray(grid_o),
                               rtol=1e-5, atol=1e-5)
    out_o = vox.trilinear_devoxelize(grid_o, gc_o, R)
    out_f = vox.trilinear_devoxelize_fast(grid_o, gc_o, R)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_o),
                               rtol=1e-5, atol=1e-5)


def test_factored_gradients_match_oracle(rng):
    pts, feat = _clouds(rng)
    nc = sph.normalize_coords_sphere(pts)
    inds, defined = sph.spherical_voxel_indices(nc, R)
    w_hi, w_lo = spherical_weight_planes(nc, inds, R)

    def loss_oracle(f):
        grid = sph.scatter_mean(f, jnp.where(defined, inds, 0), R**3,
                                valid=defined)
        out = sph.spherical_trilinear_devoxelize(
            grid.reshape(B, R, R, R, C), nc, inds, R)
        return jnp.sum(jnp.sin(out))

    def loss_fast(f):
        grid = scatter_mean_diff(f, jnp.where(defined, inds, -1), R)
        out = corner_gather_diff(grid, w_hi, w_lo, R)
        return jnp.sum(jnp.sin(out))

    np.testing.assert_allclose(float(loss_oracle(feat)),
                               float(loss_fast(feat)), rtol=1e-5)
    g_fast = jax.grad(loss_fast)(feat)
    assert bool(jnp.isfinite(g_fast).all())
    # The oracle AD backward differentiates through the scatter-mean
    # normalization exactly like the custom VJP (counts are detached),
    # so gradients must agree.
    g_oracle = jax.grad(loss_oracle)(feat)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_oracle),
                               rtol=1e-4, atol=1e-5)


def test_corner_scatter_is_gather_transpose(rng):
    """<dout, gather(G)> == <scatter(dout), G> (exact transpose pair)."""
    pts, feat = _clouds(rng)
    grid, inds, nc = sph.spherical_avg_voxelize(feat, pts, R)
    w_hi, w_lo = spherical_weight_planes(nc, inds, R)
    flat = grid.reshape(B, R**3, C)
    dout = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    lhs = jnp.sum(dout * corner_gather_factored(flat, w_hi, w_lo, R))
    rhs = jnp.sum(flat * corner_scatter_factored(dout, w_hi, w_lo, R))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


def test_bf16_path_close_to_f32(rng):
    """bf16 features: scatter sums exact (0/1 selectors, f32 accum);
    devox weight-split keeps ~f32 weight precision."""
    pts, feat = _clouds(rng)
    nc = sph.normalize_coords_sphere(pts)
    inds, defined = sph.spherical_voxel_indices(nc, R)
    sinds = jnp.where(defined, inds, -1)
    out32, _ = scatter_mean_factored(feat, sinds, R)
    out16, _ = scatter_mean_factored(feat.astype(jnp.bfloat16), sinds, R)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=2e-2, atol=2e-2)
    w_hi, w_lo = spherical_weight_planes(nc, inds, R)
    g32 = corner_gather_factored(out32, w_hi, w_lo, R)
    g16 = corner_gather_factored(out32.astype(jnp.bfloat16), w_hi, w_lo, R)
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32),
                               rtol=2e-2, atol=2e-2)
