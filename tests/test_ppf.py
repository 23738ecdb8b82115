import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.ops import se3
from rift_tpu.ops.ppf import global_ppf, local_ppf, new_ppf, ppf


def ppf_oracle(coords, centers, normals, center_normals):
    """Numpy transcription of spherical_ppf/ppf.cu:19-91."""
    n = coords.shape[0]
    out = np.zeros((n, 4), np.float32)
    for i in range(n):
        d = centers[i] - coords[i]
        d_norm = max(np.linalg.norm(d), 1e-20)
        du = d / d_norm
        n1 = center_normals[i]
        n2 = normals[i]
        n1n, n2n = np.linalg.norm(n1), np.linalg.norm(n2)
        if n1n <= 1e-10 or n2n <= 1e-10:
            continue
        n1, n2 = n1 / n1n, n2 / n2n
        out[i, 0] = np.arccos(np.clip(np.dot(du, n1), -1, 1))
        out[i, 1] = np.arccos(np.clip(np.dot(du, n2), -1, 1))
        out[i, 2] = np.arccos(np.clip(np.dot(n1, n2), -1, 1))
        out[i, 3] = d_norm
    return out


def test_ppf_matches_cuda_oracle(rng):
    n = 64
    coords = rng.randn(n, 3).astype(np.float32)
    centers = rng.randn(n, 3).astype(np.float32)
    normals = rng.randn(n, 3).astype(np.float32)
    cnormals = rng.randn(n, 3).astype(np.float32)
    normals[5] = 0.0  # undefined point
    got = np.asarray(ppf(jnp.asarray(coords), jnp.asarray(centers),
                         jnp.asarray(normals), jnp.asarray(cnormals)))
    want = ppf_oracle(coords, centers, normals, cnormals)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert np.all(got[5] == 0.0)


def test_global_ppf_rotation_invariant(rng):
    pts = rng.randn(2, 128, 3).astype(np.float32)
    nrm = rng.randn(2, 128, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    rot = np.asarray(se3.random_so3(jax.random.PRNGKey(7)))
    f1 = np.asarray(global_ppf(jnp.asarray(pts), jnp.asarray(nrm)))
    f2 = np.asarray(global_ppf(jnp.asarray(pts @ rot.T), jnp.asarray(nrm @ rot.T)))
    np.testing.assert_allclose(f1, f2, atol=2e-4)


def test_local_ppf_shapes_and_invariance(rng):
    b, n, k = 2, 32, 8
    ctr = rng.randn(b, n, 3).astype(np.float32)
    nbr = rng.randn(b, n, k, 3).astype(np.float32)
    cn = rng.randn(b, n, 3).astype(np.float32)
    nn_ = rng.randn(b, n, k, 3).astype(np.float32)
    cn /= np.linalg.norm(cn, axis=-1, keepdims=True)
    nn_ /= np.linalg.norm(nn_, axis=-1, keepdims=True)
    f = local_ppf(jnp.asarray(nbr), jnp.asarray(nn_), jnp.asarray(ctr), jnp.asarray(cn))
    assert f.shape == (b, n, k, 4)
    rot = np.asarray(se3.random_so3(jax.random.PRNGKey(9)))
    f2 = local_ppf(jnp.asarray(nbr @ rot.T), jnp.asarray(nn_ @ rot.T),
                   jnp.asarray(ctr @ rot.T), jnp.asarray(cn @ rot.T))
    np.testing.assert_allclose(np.asarray(f), np.asarray(f2), atol=2e-4)


def test_new_ppf_five_channels_and_invariance(rng):
    pts = rng.randn(1, 64, 3).astype(np.float32)
    nrm = rng.randn(1, 64, 3).astype(np.float32)
    f = new_ppf(jnp.asarray(pts), jnp.asarray(nrm))
    assert f.shape == (1, 64, 5)
    rot = np.asarray(se3.random_so3(jax.random.PRNGKey(11)))
    f2 = new_ppf(jnp.asarray(pts @ rot.T), jnp.asarray(nrm @ rot.T))
    np.testing.assert_allclose(np.asarray(f), np.asarray(f2), atol=5e-4)


def test_local_ppf_grouped_fast_matches_shipped_composition(rng):
    """The fused channel-map path must reproduce the shipped eval
    composition (ball_query_group -> local_ppf -> bf16 cast): identical
    slot_valid and neighbor ordering, features within one bf16 ulp (the
    only difference is one f32 reassociation per dot product)."""
    import jax.numpy as jnp

    from rift_tpu.ops.neighbors import ball_query_group
    from rift_tpu.ops.ppf import local_ppf, local_ppf_grouped_fast

    b, n, k, radius = 2, 96, 16, 0.5
    coords = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)
    normals = rng.randn(b, n, 3).astype(np.float32)
    normals = jnp.asarray(normals / np.linalg.norm(normals, axis=-1,
                                                   keepdims=True))
    nbr, ok_ref = ball_query_group(
        coords, coords, jnp.concatenate([coords, normals], -1), radius, k)
    ref = local_ppf(nbr[..., :3], nbr[..., 3:], coords, normals
                    ).astype(jnp.bfloat16)
    got, ok = local_ppf_grouped_fast(coords, normals, radius, k)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))
    mask = np.asarray(ok)[..., None]
    diff = np.abs(np.where(mask, np.asarray(got, np.float32)
                           - np.asarray(ref, np.float32), 0.0))
    assert diff.max() < 0.02, diff.max()  # one bf16 ulp on [0, pi] values
    # distances (channel 3) are computed identically -> exact
    np.testing.assert_allclose(
        np.where(mask[..., 0], np.asarray(got, np.float32)[..., 3], 0),
        np.where(mask[..., 0], np.asarray(ref, np.float32)[..., 3], 0),
        atol=1e-3)
