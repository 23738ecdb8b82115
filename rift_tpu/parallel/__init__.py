"""Distribution layer (SURVEY.md §2.8 + §7 dist/): mesh, shardings,
multi-host init, sharded matching."""
from .mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    initialize_multihost,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .sharded_ops import make_sharded_train_step, sharded_mutual_nn  # noqa: F401
