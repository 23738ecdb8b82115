#!/usr/bin/env python
"""SCALING_r05: weak-scaling validation + analytic ICI efficiency model.

Real multi-chip hardware is not reachable from this environment (one v5e
chip via a tunnel), so the BASELINE target — ">=80% weak-scaling
efficiency of registered scan-pairs/s from 1 host to 4 hosts" — is
addressed with the two instruments that ARE available (VERDICT r4 #5):

1. PROGRAM VALIDATION on a virtual 8-device CPU mesh: the exact sharded
   programs (batch-sharded ransac+picp registration pipeline, DP train
   step, row-sharded mutual-NN) compile and execute with their
   collectives; CPU efficiencies are indicative only (all "devices" share
   one socket) and are labeled as such.

2. ANALYTIC ICI MODEL from exact per-step collective byte counts (counted
   from the parameter tree / program shapes, not estimated) and v5e ICI
   constants, giving a predicted 1->4-host efficiency for each program:

   - serving pipeline (the BASELINE quantity): batch-sharded, the only
     cross-device traffic is the [bp, 4, 4] transform all-gather;
   - DP training step: one gradient all-reduce of the full parameter
     tree per step;
   - sharded n x n matching: the all_gather at
     parallel/sharded_ops.py:45-48 RECEIVES p*n2*8 bytes per device —
     linear in mesh size — so the model also reports the crossover mesh
     size where communication overtakes the shrinking local tile.

Run: python scripts/scaling_model.py  (CPU; writes SCALING_r05.json)
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# v5e ICI constants (per chip, 2-D torus): 4 links x ~45 GB/s each
# direction. Effective all-reduce bandwidth per chip ~2 links per torus
# axis working in both directions. (jax-ml.github.io/scaling-book v5e
# table; stated here as model assumptions, not measurements.)
ICI_LINK_GBPS = 45.0e9
ICI_LINKS = 4
AR_EFF_BW = 2 * ICI_LINK_GBPS          # bytes/s usable for all-reduce
AG_EFF_BW = 2 * ICI_LINK_GBPS          # all-gather, ring over one axis

# Measured single-chip device times (v5e, this round):
EVAL_MS_PER_64_PAIRS = 151.2           # ROOFLINE_r05 stage sum
TRAIN_STEP_MS_EST = 73.7
# flagship classification train step at bs=16, K-slope measured on v5e
# (fwd+bwd+optax; /tmp-series microbench, 2026-08-21).


def flagship_param_bytes() -> int:
    from rift_tpu.models import PVCNNClassifier

    model = PVCNNClassifier(
        blocks=((64, 1, 32), (128, 1, 32), (256, 1, None), (512, 1, None)),
        dim_k=512, is_classify=False, point_kernel_formal="pointnet_kernel",
        voxel_shape="spherical", rot_invariant_preprocess="change_coords",
        with_local_feat="ppf", extra_feature_channels=4,
        local_neighbors=128, with_coeff=True, with_se=True)
    x = jnp.zeros((1, 256, 6))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    leaves = jax.tree_util.tree_leaves(variables)
    return int(sum(np.prod(l.shape) * 4 for l in leaves))


def predicted_efficiency(t_compute_s: float, comm_bytes_per_step: float,
                         bw: float) -> float:
    t_comm = comm_bytes_per_step / bw
    return t_compute_s / (t_compute_s + t_comm)


def main() -> None:
    t_start = time.time()
    param_bytes = flagship_param_bytes()

    # ---- analytic predictions (1 host = 8 chips -> 4 hosts = 32 chips,
    # all on ICI for a v5e pod slice; weak scaling = per-chip work const).
    results: dict = {"assumptions": {
        "ici_link_GBps": ICI_LINK_GBPS / 1e9,
        "ici_links": ICI_LINKS,
        "allreduce_eff_GBps": AR_EFF_BW / 1e9,
        "eval_ms_per_64_pairs_measured": EVAL_MS_PER_64_PAIRS,
        "train_step_ms_measured": round(TRAIN_STEP_MS_EST, 1),
        "topology": "v5e 2-D torus, 4 hosts = 32 chips on ICI (no DCN)",
    }}

    # Serving pipeline: per-chip step = 64 pairs in EVAL_MS; collective =
    # all-gather of [64*p, 4, 4] f32 transforms (each chip receives the
    # other chips' results).
    t_c = EVAL_MS_PER_64_PAIRS / 1e3
    preds = {}
    for p in (8, 32):
        bytes_ag = 64 * p * 16 * 4  # everyone receives the full result
        preds[f"chips_{p}"] = round(
            predicted_efficiency(t_c, bytes_ag, AG_EFF_BW), 6)
    preds["vs_target"] = "PASS (>=0.80)" if preds["chips_32"] >= 0.8 \
        else "FAIL"
    results["serving_pipeline_weak_scaling"] = {
        "collective": "all_gather of [64p, 4, 4] f32 poses",
        "per_step_comm_bytes_at_32": 64 * 32 * 64,
        "predicted_efficiency": preds,
        "note": "batch-sharded registration is embarrassingly parallel; "
                "the BASELINE >=80% 1->4-host target is met with margin "
                "in this model — communication is ~microseconds against "
                "a ~151 ms step.",
    }

    # DP training: gradient all-reduce of the full parameter tree.
    t_step = TRAIN_STEP_MS_EST / 1e3
    ar_bytes = 2 * param_bytes  # reduce-scatter + all-gather volume/chip
    eff_train = predicted_efficiency(t_step, ar_bytes, AR_EFF_BW)
    results["dp_train_step"] = {
        "param_bytes": param_bytes,
        "grad_allreduce_bytes_per_chip": ar_bytes,
        "predicted_comm_ms": round(ar_bytes / AR_EFF_BW * 1e3, 3),
        "predicted_efficiency_any_mesh": round(eff_train, 4),
        "note": "ring all-reduce volume per chip is mesh-size independent;"
                " efficiency holds at any slice size on ICI.",
    }

    # Sharded n x n matching: local tile [n1/p, n2] matmul vs all_gather
    # receiving p*n2*8 bytes (f32 min + i32 argmin).
    n1 = n2 = 1024
    c = 512
    bf16_flops = 197e12
    crossover = None
    rows = []
    for p in (2, 4, 8, 16, 32, 64, 128, 256):
        t_tile = 2 * (n1 / p) * n2 * c / bf16_flops
        comm = p * n2 * 8
        t_comm = comm / AG_EFF_BW
        eff = t_tile / (t_tile + t_comm)
        rows.append({"p": p, "tile_us": round(t_tile * 1e6, 2),
                     "gather_us": round(t_comm * 1e6, 3),
                     "efficiency": round(eff, 4)})
        if crossover is None and t_comm > t_tile:
            crossover = p
    results["sharded_mutual_nn"] = {
        "collective": "all_gather [p, n2] f32 + [p, n2] i32 "
                      "(parallel/sharded_ops.py:45-48)",
        "scaling_rows": rows,
        "crossover_mesh_size": crossover,
        "note": "per-device gather volume grows linearly with p while the "
                "local tile shrinks as 1/p — beyond the crossover, switch "
                "to a psum-of-one-hot column reduction or keep matching "
                "within subgroups (jax.lax.axis_index subsets).",
    }

    # ---- virtual-mesh program validation (the part we can RUN).
    from rift_tpu.parallel.scaling import registration_weak_scaling

    res = registration_weak_scaling(mesh_sizes=(1, 2, 4, 8),
                                    pairs_per_device=4, num_points=256,
                                    reps=2)
    results["virtual_mesh_validation"] = {
        **res.as_dict(),
        "method": "ransac+picp (shipped preset composition)",
        "note": "8 virtual CPU devices share one socket — this validates "
                "that the sharded programs compile+run with their "
                "collectives; efficiencies here are NOT hardware "
                "predictions (see analytic model above).",
    }
    results["wall_s"] = round(time.time() - t_start, 1)

    out = os.path.join(REPO, "SCALING_r05.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items()
                      if k != "sharded_mutual_nn"}, indent=2)[:2000])
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
