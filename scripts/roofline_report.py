"""Per-stage roofline / MFU report at the flagship bench shapes.

Measures each pipeline stage on the current device and compares against the
analytic byte/FLOP lower bounds (rift_tpu/train/roofline.py). Run on the
TPU for real numbers; prints a JSON document (commit as ROOFLINE_r{N}.json).

Methodology (round 4): per-stage device time is the K-application SLOPE of
the stage inside ONE jitted lax.scan (inputs perturbed per iteration to
defeat CSE). Earlier rounds timed one dispatch per call, which on this
setup's remote-compile tunnel includes a ~25-130 ms host/dispatch floor —
ROOFLINE_r03's per-stage numbers are floor-contaminated and NOT comparable
(see BENCH_NOTES.md).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

K_LO, K_HI = 2, 6


def _wall(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fn(*args))
    return (time.perf_counter() - t0) / reps


def slope_time(stage, *data, reps=3):
    """stage(x_perturb, *data) -> scalar; returns seconds per application."""
    def many(k):
        @jax.jit
        def f(x, *data):
            def body(c, i):
                return c + stage(x + c * 1e-12 + i * 1e-6, *data), None
            s, _ = lax.scan(body, jnp.zeros((), jnp.float32),
                            jnp.arange(k, dtype=jnp.float32))
            return s
        return f

    x = jnp.zeros(())
    t_lo = _wall(many(K_LO), x, *data, reps=reps)
    t_hi = _wall(many(K_HI), x, *data, reps=reps)
    return max((t_hi - t_lo) / (K_HI - K_LO), 1e-6)


def main() -> None:
    from rift_tpu.data.registration_pairs import SyntheticPairs
    from rift_tpu.nn.shared_mlp import SharedMLP
    from rift_tpu.ops.neighbors import mutual_nearest_neighbors
    from rift_tpu.ops.normals import estimate_normals
    from rift_tpu.ops.ppf import local_ppf_grouped_fast
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

    def s_normals(x, clouds):
        return jnp.sum(estimate_normals(clouds + x)) * 1e-9

    measured["normals"] = slope_time(s_normals, clouds)

    mlp = SharedMLP([32, 64], dtype=jnp.bfloat16)
    ppf0 = jnp.zeros((1, 8, 8, 4), jnp.float32)
    mvars = mlp.init(jax.random.PRNGKey(0), ppf0, train=False)

    def s_local(x, clouds, nrm, mvars):
        # the model's bf16 eval path (models/pvcnn.py -> fused channel maps)
        feats, ok = local_ppf_grouped_fast(clouds + x, nrm, 0.3, k)
        fused = mlp.apply(mvars, feats, train=False)
        return jnp.sum(jnp.max(
            jnp.where(ok[..., None], fused.astype(jnp.float32), -jnp.inf),
            axis=-2)) * 1e-9

    measured["local_ppf"] = slope_time(s_local, clouds, nrm, mvars)

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

        def s_conv(x, cvars, feats0, clouds, conv=conv):
            out = conv.apply(cvars, feats0 + x, clouds, train=False)
            return jnp.sum(out.astype(jnp.float32)) * 1e-9

        measured[name] = slope_time(s_conv, cvars, feats0, clouds)

    f_src = jnp.asarray(
        np.random.RandomState(2).randn(bp, n, dim_k).astype(np.float32))
    f_dst = f_src + 0.1 * jnp.asarray(
        np.random.RandomState(3).randn(bp, n, dim_k).astype(np.float32))

    def s_match(x, f_src, f_dst):
        _, i2, m = jax.vmap(mutual_nearest_neighbors)(f_src + x, f_dst)
        return jnp.sum(i2) * 1e-9 + jnp.sum(m)

    measured["matching"] = slope_time(s_match, f_src, f_dst)

    _, i2, msk = jax.vmap(mutual_nearest_neighbors)(f_src, f_dst)
    matched = jnp.take_along_axis(dst, i2[..., None], axis=-2)

    def s_gnc(x, src, matched, msk):
        t = jax.vmap(lambda a, bb, cc: gnc_pose(
            a, bb, cc, noise_bound=0.02)[0])(src + x, matched, msk)
        return jnp.sum(t) * 1e-6

    measured["gnc"] = slope_time(s_gnc, src, matched, msk)

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
                "mfu = stage FLOPs / (measured * peak FLOPs). Stage times "
                "are K-application slopes inside one jitted scan "
                "(dispatch-floor-free; r03 numbers used one dispatch per "
                "rep and are inflated by the ~25-130 ms tunnel floor).",
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
