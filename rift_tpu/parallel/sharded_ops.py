"""Sharded registration ops: the n×n matching problem over the mesh.

The reference's correspondence search is a single-host numpy n×n distance
matrix (`deepgmr_mn40.py:232-244`). Here the matrix is sharded row-wise over
the mesh's data axis with `shard_map` — each device owns an [n1/p, n2] tile
(one MXU matmul), computes its row-argmins locally, and the column-argmin
(needed for cycle consistency) is reduced across devices with an
all_gather of per-device (min, argmin) pairs. This is the "sharded top-k
matching" scale axis called out in SURVEY.md §5 / BASELINE.md.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.neighbors import pairwise_sqdist
from .mesh import DATA_AXIS

Array = jax.Array


def sharded_mutual_nn(feat1: Array, feat2: Array, mesh: Mesh,
                      axis: str = DATA_AXIS) -> tuple[Array, Array, Array]:
    """Mutual-NN with the distance matrix sharded over mesh axis `axis`.

    feat1 [n1, c] (n1 divisible by mesh size), feat2 [n2, c] replicated.
    Returns (idx1 [n1], idx2 [n1], mask [n1]) — same contract as
    `ops.neighbors.mutual_nearest_neighbors`.
    """
    n1 = feat1.shape[0]

    def local(f1_tile: Array, f2: Array):
        p = jax.lax.axis_index(axis)
        rows = f1_tile.shape[0]
        d = pairwise_sqdist(f1_tile, f2)            # [n1/p, n2] local tile
        corr12_local = jnp.argmin(d, axis=-1)       # [n1/p]
        # column-min candidates from this shard
        col_min = jnp.min(d, axis=0)                # [n2]
        col_arg = jnp.argmin(d, axis=0) + p * rows  # global row ids
        # reduce across shards: gather all candidates, pick global min
        all_min = jax.lax.all_gather(col_min, axis)  # [p, n2]
        all_arg = jax.lax.all_gather(col_arg, axis)
        winner = jnp.argmin(all_min, axis=0)        # [n2]
        corr21 = jnp.take_along_axis(all_arg, winner[None, :], axis=0)[0]  # [n2]
        # cycle consistency for the local rows
        my_rows = p * rows + jnp.arange(rows)
        mask = corr21[corr12_local] == my_rows
        return corr12_local.astype(jnp.int32), mask

    corr12, mask = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(None, None)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )(feat1, feat2)
    idx1 = jnp.arange(n1, dtype=jnp.int32)
    return idx1, corr12, mask


def make_sharded_train_step(train_step, mesh: Mesh, axis: str = DATA_AXIS):
    """Wrap a jitted train step with explicit data-parallel shardings:
    replicated state, batch-sharded inputs. Gradient psum is inserted by XLA
    from the sharding propagation (batch reductions become cross-device
    collectives over ICI automatically)."""
    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    @partial(jax.jit,
             in_shardings=(rep, shard, shard, rep),
             out_shardings=(rep, rep))
    def step(state, clouds, labels, rng):
        return train_step(state, clouds, labels, rng)

    return step
