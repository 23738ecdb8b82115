"""Point sampling ops: furthest point sampling, gather, random choice.

TPU-native equivalents of the reference CUDA ops `furthest_point_sampling`
and `gather` (`src/sampling/sampling.cu:18-180`) and the numpy helper
`utils/random_choice.py`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def furthest_point_sample(coords: Array, num_samples: int,
                          start_idx: Array | int = 0) -> Array:
    """Iterative farthest point sampling.

    coords [..., n, 3] -> indices int32 [..., m]. Sequential by nature
    (`sampling.cu:87-180`); expressed as a `lax.scan` over m steps with a
    running min-distance array — compiler-friendly static control flow.
    """
    n = coords.shape[-2]
    batch_shape = coords.shape[:-2]
    start = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), batch_shape)

    def sample_one(pts, s0):
        def step(carry, _):
            min_d2, last = carry
            last_pt = pts[last]
            d2 = jnp.sum((pts - last_pt) ** 2, axis=-1)
            min_d2 = jnp.minimum(min_d2, d2)
            nxt = jnp.argmax(min_d2).astype(jnp.int32)
            return (min_d2, nxt), last

        init = (jnp.full((n,), jnp.inf, pts.dtype), s0.astype(jnp.int32))
        _, idx = jax.lax.scan(step, init, None, length=num_samples)
        return idx

    fn = sample_one
    for _ in range(len(batch_shape)):
        fn = jax.vmap(fn)
    return fn(coords, start)


def gather(features: Array, indices: Array) -> Array:
    """features [..., n, c], indices int [..., m] -> [..., m, c]
    (ref: `sampling.cu:18-75`; backward scatter-add via AD)."""
    return jnp.take_along_axis(features, indices[..., None].astype(jnp.int32),
                               axis=-2)


def random_choice(key: Array, n: int, num_samples: int) -> Array:
    """Sample `num_samples` indices from range(n): without replacement when
    n >= num_samples, with replacement otherwise
    (ref: `utils/random_choice.py:2-7` randchoice)."""
    if n >= num_samples:
        return jax.random.permutation(key, n)[:num_samples]
    return jax.random.randint(key, (num_samples,), 0, n)
