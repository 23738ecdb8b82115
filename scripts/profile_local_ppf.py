"""Isolated TPU timing: fused local-PPF kernel vs unfused composition."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.ops.pallas.local_ppf_fused import local_ppf_fused
from rift_tpu.ops.neighbors import ball_query, grouping
from rift_tpu.ops.ppf import local_ppf


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        float(jnp.sum(o))
    return (time.perf_counter() - t0) / reps


def main():
    b, n, k, radius = 128, 1024, 128, 0.3
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)
    normals = rng.randn(b, n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    normals = jnp.asarray(normals)
    w1 = jnp.asarray(rng.randn(4, 32).astype(np.float32) * 0.5)
    b1 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(32, 64).astype(np.float32) * 0.3)
    b2 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)

    @jax.jit
    def fused(c, nm):
        return local_ppf_fused(c, nm, w1, b1, w2, b2,
                               radius=radius, max_neighbors=k)

    @jax.jit
    def unfused(c, nm):
        idx = ball_query(c, c, radius, k)
        nbr = grouping(jnp.concatenate([c, nm], -1), idx)
        feats = local_ppf(nbr[..., :3], nbr[..., 3:], c, nm)
        fb = feats.astype(jnp.bfloat16)
        h = jax.nn.relu((fb @ w1.astype(jnp.bfloat16)).astype(jnp.float32) + b1)
        o = jax.nn.relu((h.astype(jnp.bfloat16) @ w2.astype(jnp.bfloat16)).astype(jnp.float32) + b2)
        return jnp.max(o, axis=-2)

    print(f"fused   {timeit(fused, coords, normals)*1e3:8.2f} ms")
    print(f"unfused {timeit(unfused, coords, normals)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
