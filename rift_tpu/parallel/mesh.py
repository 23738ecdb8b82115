"""Device mesh construction + multi-host initialization.

The reference's only parallelism is single-process `nn.DataParallel`
(SURVEY.md §2.8); here distribution is first-class: a `jax.sharding.Mesh`
over all devices with a data axis (and an optional model axis reserved for
sharded matching), `jax.distributed.initialize` for multi-host, and
NamedSharding helpers used by the train step and the registration matcher.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """`jax.distributed.initialize` wrapper (no-op when single-process)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(devices=None, axis: str = DATA_AXIS) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis,))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis (batch) sharding; remaining axes replicated."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every array in the tree with its leading axis sharded."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), tree
    )


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree
    )
