"""TPU timing: rank-select local branch vs top_k composition (eval path)."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.ops.neighbors import ball_query, ball_query_group, grouping
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
    w2 = jnp.asarray(rng.randn(32, 64).astype(np.float32) * 0.3)

    def mlp(f):
        h = jax.nn.relu((f.astype(jnp.bfloat16) @ w1.astype(jnp.bfloat16)).astype(jnp.float32))
        return jax.nn.relu((h.astype(jnp.bfloat16) @ w2.astype(jnp.bfloat16)).astype(jnp.float32))

    @jax.jit
    def old(c, nm):
        idx = ball_query(c, c, radius, k)
        nbr = grouping(jnp.concatenate([c, nm], -1), idx)
        feats = local_ppf(nbr[..., :3], nbr[..., 3:], c, nm)
        return jnp.max(mlp(feats), axis=-2)

    @jax.jit
    def new(c, nm):
        nbr, ok = ball_query_group(c, c, jnp.concatenate([c, nm], -1), radius, k)
        feats = local_ppf(nbr[..., :3], nbr[..., 3:], c, nm)
        o = jnp.where(ok[..., None], mlp(feats), -jnp.inf)
        return jnp.max(o, axis=-2)

    t_old = timeit(old, coords, normals)
    t_new = timeit(new, coords, normals)
    print(f"old(topk) {t_old*1e3:8.2f} ms")
    print(f"new(rank) {t_new*1e3:8.2f} ms")
    a, bb = old(coords, normals), new(coords, normals)
    print("max abs diff:", float(jnp.max(jnp.abs(a - bb))))


if __name__ == "__main__":
    main()
