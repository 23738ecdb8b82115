"""Multi-host rehearsal: 2 local processes x 2 CPU devices through
`jax.distributed` (VERDICT r1 item 8).

What multi-chip CPU meshes cannot rehearse is the process boundary:
`initialize_multihost` wiring, cross-process device visibility, and
collectives spanning processes (the DCN axis on real pods). This test
launches two worker subprocesses that initialize a shared coordinator, build
a 4-device global mesh, run (a) one data-parallel sharded train step on the
tiny model and (b) sharded mutual-NN matching, and assert against
process-local oracles.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import json, os, sys

import numpy as np

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
coordinator = sys.argv[3]
out_path = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from rift_tpu.parallel import (initialize_multihost, make_mesh,
                               make_sharded_train_step, sharded_mutual_nn)

initialize_multihost(coordinator=coordinator, num_processes=num_procs,
                     process_id=proc_id)
assert jax.process_count() == num_procs, jax.process_count()
assert len(jax.devices()) == 2 * num_procs, jax.devices()
assert len(jax.local_devices()) == 2

import jax.numpy as jnp
from jax.experimental import multihost_utils

from rift_tpu.ops.neighbors import mutual_nearest_neighbors
from rift_tpu.train.config import get_config
from rift_tpu.train.loop import build_model
from rift_tpu.train.steps import create_state, make_train_step

mesh = make_mesh()  # all 4 global devices

# (a) one data-parallel train step across processes
cfg = get_config("tiny_smoke")
model = build_model(cfg)
rs = np.random.RandomState(0)
clouds = rs.randn(8, cfg.dataset.num_points, 6).astype(np.float32)
labels = rs.randint(0, 40, 8).astype(np.int32)
state, tx = create_state(model, cfg, jnp.asarray(clouds), 4, seed=0)
# numpy leaves = replicated host values, addressable on every process
state = jax.device_get(state)
rng = np.zeros(2, np.uint32)  # legacy uint32 PRNG key, replicated
step = make_sharded_train_step(make_train_step(model, tx), mesh)
g_clouds = multihost_utils.host_local_array_to_global_array(
    clouds[4 * proc_id: 4 * proc_id + 4], mesh,
    jax.sharding.PartitionSpec("data"))
g_labels = multihost_utils.host_local_array_to_global_array(
    labels[4 * proc_id: 4 * proc_id + 4], mesh,
    jax.sharding.PartitionSpec("data"))
new_state, metrics = step(state, g_clouds, g_labels, rng)
loss = float(metrics["loss"])

# oracle: the SAME full global batch computed process-locally
oracle_step = make_train_step(model, tx)
_, oracle_metrics = oracle_step(jax.device_get(state), jnp.asarray(clouds),
                                jnp.asarray(labels), rng)
oracle_loss = float(oracle_metrics["loss"])

# (b) sharded mutual-NN across the process-spanning mesh
f1 = rs.randn(16, 8).astype(np.float32)
f2 = rs.randn(16, 8).astype(np.float32)
idx1, idx2, mask = sharded_mutual_nn(f1, f2, mesh)
o1, o2, om = mutual_nearest_neighbors(jnp.asarray(f1), jnp.asarray(f2))
nn_match = bool(jnp.all(idx2 == o2) & jnp.all(mask == om))

with open(out_path, "w") as f:
    json.dump({"process_id": proc_id, "loss": loss,
               "oracle_loss": oracle_loss, "nn_match": nn_match}, f)
print("worker", proc_id, "ok", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train_step_and_matching(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"out{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_py), str(pid), "2", coordinator,
             str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=540)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    results = [json.loads(o.read_text()) for o in outs]
    # both processes observe the same global loss, equal to the
    # process-local full-batch oracle
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["loss"] == pytest.approx(results[0]["oracle_loss"],
                                               rel=1e-4)
    assert np.isfinite(results[0]["loss"])
    assert all(r["nn_match"] for r in results)
