"""Per-stage roofline / MFU report at the flagship bench shapes.

Measures each pipeline stage on the current device and compares against the
analytic byte/FLOP lower bounds (rift_tpu/train/roofline.py). Run on the
TPU for real numbers; prints a JSON document (commit as ROOFLINE_r{N}.json).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
        float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        float(jnp.sum(jax.tree.leaves(o)[0]))
    return (time.perf_counter() - t0) / reps


def main() -> None:
    from rift_tpu.data.registration_pairs import SyntheticPairs
    from rift_tpu.models import PVCNNClassifier
    from rift_tpu.nn.shared_mlp import SharedMLP
    from rift_tpu.ops.neighbors import (ball_query, grouping,
                                        mutual_nearest_neighbors)
    from rift_tpu.ops.normals import estimate_normals
    from rift_tpu.ops.ppf import local_ppf
    from rift_tpu.registration import gnc_pose
    from rift_tpu.train.roofline import chip_peaks, flagship_costs

    n, bp, k, dim_k = 1024, 64, 128, 512
    b = 2 * bp
    peaks = chip_peaks()
    costs = flagship_costs(bp, n, k, dim_k, bf16=True)

    pairs = SyntheticPairs(num_pairs=bp, num_points=n, mode="noise",
                           max_amp=0.5)
    src = jnp.asarray(np.stack([pairs[i][0] for i in range(bp)]))
    dst = jnp.asarray(np.stack([pairs[i][1] for i in range(bp)]))
    clouds = jnp.concatenate([src, dst], 0)  # [2bp, n, 3]
    nrm_host = np.random.RandomState(0).randn(b, n, 3).astype(np.float32)
    nrm_host /= np.linalg.norm(nrm_host, axis=-1, keepdims=True)
    nrm = jnp.asarray(nrm_host)

    measured: dict[str, float] = {}
    measured["normals"] = timeit(jax.jit(estimate_normals), clouds)

    mlp = SharedMLP([32, 64], dtype=jnp.bfloat16)
    ppf0 = jnp.zeros((1, 8, 8, 4), jnp.float32)
    mvars = mlp.init(jax.random.PRNGKey(0), ppf0, train=False)

    def local_branch(c, nm):
        idx = ball_query(c, c, 0.3, k)
        nbr = grouping(jnp.concatenate([c, nm], -1), idx)
        feats = local_ppf(nbr[..., :3], nbr[..., 3:], c, nm)
        return jnp.max(mlp.apply(mvars, feats, train=False), axis=-2)

    measured["local_ppf"] = timeit(jax.jit(local_branch), clouds, nrm)

    # PVConv blocks measured through the model at flagship widths
    from rift_tpu.nn.pvconv import PVConv

    for name, cin, cout in (("pvconv1", 71, 64), ("pvconv2", 64, 128)):
        conv = PVConv(out_channels=cout, point_kernel_formal="dgcnn_kernel",
                      voxel_shape="spherical", resolution=32,
                      with_coeff=True, with_se=True, normalize=False,
                      dtype=jnp.bfloat16)
        feats0 = jnp.asarray(
            np.random.RandomState(1).randn(b, n, cin).astype(np.float32))
        cvars = conv.init(jax.random.PRNGKey(0), feats0, clouds, train=False)
        measured[name] = timeit(
            jax.jit(lambda v, f, c: conv.apply(v, f, c, train=False)),
            cvars, feats0, clouds)

    f_src = jnp.asarray(
        np.random.RandomState(2).randn(bp, n, dim_k).astype(np.float32))
    f_dst = f_src + 0.1 * jnp.asarray(
        np.random.RandomState(3).randn(bp, n, dim_k).astype(np.float32))

    def match(f1, f2):
        return jax.vmap(mutual_nearest_neighbors)(f1, f2)

    measured["matching"] = timeit(jax.jit(match), f_src, f_dst)

    _, i2, msk = match(f_src, f_dst)
    matched = jnp.take_along_axis(dst, i2[..., None], axis=-2)

    def gnc(s, d, m):
        return jax.vmap(lambda a, bb, cc: gnc_pose(a, bb, cc,
                                                   noise_bound=0.02)[0])(s, d, m)

    measured["gnc"] = timeit(jax.jit(gnc), src, matched, msk)

    rows = [costs[name].report(measured[name], peaks) for name in measured]
    total_ms = sum(r["measured_ms"] for r in rows)
    out = {
        "device": peaks.name,
        "peaks": {"bf16_tflops": peaks.flops_bf16 / 1e12,
                  "f32_tflops": peaks.flops_f32 / 1e12,
                  "hbm_gbps": peaks.hbm_gbps / 1e9},
        "shapes": {"batch_pairs": bp, "clouds": b, "n": n, "k": k,
                   "dim_k": dim_k},
        "stages": rows,
        "stage_sum_ms": round(total_ms, 2),
        "note": "sol_fraction = analytic roofline lower bound / measured; "
                "mfu = stage FLOPs / (measured * peak FLOPs). Stages "
                "measured as standalone jitted programs - the full fused "
                "forward overlaps some of these.",
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
