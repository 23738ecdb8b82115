import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.ops.neighbors import mutual_nearest_neighbors
from rift_tpu.parallel import make_mesh, sharded_mutual_nn


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_mutual_nn_matches_single_device(rng):
    mesh = make_mesh()
    n, c = 64, 16
    f1 = jnp.asarray(rng.randn(n, c).astype(np.float32))
    f2 = jnp.asarray(rng.randn(48, c).astype(np.float32))
    want_i1, want_i2, want_mask = mutual_nearest_neighbors(f1, f2)
    f1_sharded = jax.device_put(
        f1, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data", None))
    )
    got_i1, got_i2, got_mask = sharded_mutual_nn(f1_sharded, f2, mesh)
    np.testing.assert_array_equal(np.asarray(got_i1), np.asarray(want_i1))
    np.testing.assert_array_equal(np.asarray(got_i2), np.asarray(want_i2))
    np.testing.assert_array_equal(np.asarray(got_mask), np.asarray(want_mask))


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)
