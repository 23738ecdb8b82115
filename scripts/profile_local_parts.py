"""Component timing of the unfused local-PPF branch on TPU."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.ops.neighbors import pairwise_sqdist, grouping, ball_query
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
    cn = jnp.concatenate([coords, normals], -1)
    idx = jax.jit(lambda c: ball_query(c, c, radius, k))(coords)
    nbr = jax.jit(grouping)(cn, idx)

    t_dist = timeit(jax.jit(lambda c: pairwise_sqdist(c, c)), coords)

    @jax.jit
    def keyfn(c):
        d2 = pairwise_sqdist(c, c)
        valid = (d2 < radius * radius) & (d2 > 1e-5)
        ar = jnp.arange(n, dtype=jnp.int32)
        return jnp.where(valid, ar, n)
    key = keyfn(coords)
    t_topk = timeit(jax.jit(lambda key: jax.lax.top_k(-key, k)[0]), key)
    t_gather = timeit(jax.jit(grouping), cn, idx)
    t_ppf = timeit(jax.jit(lambda nb, c, nm: local_ppf(nb[..., :3], nb[..., 3:], c, nm)), nbr, coords, normals)
    print(f"dist    {t_dist*1e3:7.2f} ms")
    print(f"top_k   {t_topk*1e3:7.2f} ms")
    print(f"gather  {t_gather*1e3:7.2f} ms")
    print(f"ppf     {t_ppf*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
