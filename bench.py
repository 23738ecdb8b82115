"""Benchmark: registered scan-pairs/s/chip for the full two-stage pipeline.

Measures steady-state end-to-end registration throughput on the available
accelerator: per-point rotation-invariant features (flagship PVCNN sph+dgcnn
extractor, 1024 points) -> mutual-NN matching -> GNC-TLS robust pose,
everything jitted and batched on device.

Methodology: ONE jitted program registers a STACK of batches (lax.scan over
6 batches of 64 pairs), so per-dispatch host/tunnel overhead (~130 ms per
execute on this setup, measured as wall minus the K-application slope of
the same program, scripts/microbench4.py register) amortizes over 384
pairs, exactly as a production serving loop would batch its queue.
Several stacked dispatches are enqueued back-to-back and synchronized at
the end; the number is sustained throughput including all remaining host
overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: MEASURED on this host by scripts/measure_baseline.py — a
faithful numpy re-implementation of the reference's per-pair CPU loop
(n x n mutual-NN matching + TEASER GNC-TLS with the exact
deepgmr_mn40.py:207-216 parameters), written to BASELINE_MEASURED.json.
That loop covers only the reference's matching+solver stage (its per-cloud
GPU forward is extra), so the denominator overstates the reference and
vs_baseline is conservative. Fallback constant = the value measured on
this machine at commit time.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PAIRS_PER_S = 19.317  # scripts/measure_baseline.py on this host


def _baseline_pairs_per_s() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            return float(json.load(f)["pairs_per_s"])
    except (OSError, KeyError, ValueError):
        return BASELINE_PAIRS_PER_S


def _make_model(kernel: str):
    from rift_tpu.models import PVCNNClassifier

    return PVCNNClassifier(
        blocks=((64, 1, 32), (128, 1, 32), (256, 1, None), (512, 1, None)),
        dim_k=512, is_classify=False,
        point_kernel_formal=kernel + "_kernel", voxel_shape="spherical",
        rot_invariant_preprocess="change_coords", with_local_feat="ppf",
        extra_feature_channels=4, local_neighbors=128,
        with_coeff=True, with_se=True,
        dtype="bfloat16",  # conv/MLP stacks on the MXU at bf16; geometry f32
    )


def _measure(kernel: str, src, dst, batch_pairs: int, stack: int) -> float:
    """Sustained pairs/s of the full register program for one model kernel,
    `stack` batches per dispatch (stack=1 = single-batch dispatch latency
    included per batch)."""
    from rift_tpu.ops.normals import estimate_normals
    from rift_tpu.ops.neighbors import mutual_nearest_neighbors
    from rift_tpu.registration import gnc_pose

    model = _make_model(kernel)
    sample = jnp.concatenate([src[:1], jnp.zeros_like(src[:1])], -1)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)

    def register_batch(variables, src, dst):
        # Both clouds of every pair go through one forward: [2b, n, 6].
        clouds = jnp.concatenate([src, dst], 0)
        x = jnp.concatenate([clouds, estimate_normals(clouds)], -1)
        feats = model.apply(variables, x, train=False)
        f_src, f_dst = feats[:src.shape[0]], feats[src.shape[0]:]

        def one(s, d, fs, fd):
            i1, i2, mask = mutual_nearest_neighbors(fs, fd)
            # BENCH_GNC_EARLY_EXIT=0 forces the fixed-length scan schedule
            # (regression bisect; see registration/gnc.py early_exit).
            t, _ = gnc_pose(s[i1], d[i2], mask, noise_bound=0.02,
                            early_exit=os.environ.get(
                                "BENCH_GNC_EARLY_EXIT", "1") != "0")
            return t

        return jax.vmap(one)(src, dst, f_src, f_dst)

    @jax.jit
    def register_stack(variables, src_stack, dst_stack):
        def body(_, sd):
            s, d = sd
            return 0, register_batch(variables, s, d)

        _, outs = jax.lax.scan(body, 0, (src_stack, dst_stack))
        return outs

    def sync(x):
        # A tiny host fetch of a device-reduced scalar: the only reliable
        # synchronization on the tunneled TPU backend (block_until_ready
        # returns at dispatch there, not completion).
        return float(jnp.sum(x))

    src_stack = jnp.stack([src + 1e-4 * i for i in range(stack)])
    dst_stack = jnp.stack([dst] * stack)

    # Warm up / compile.
    sync(register_stack(variables, src_stack, dst_stack))

    # Timed: enqueue all dispatches, sync once (inputs varied per rep).
    reps = 3
    t0 = time.perf_counter()
    outs = [register_stack(variables, src_stack + 1e-4 * i, dst_stack)
            for i in range(reps)]
    for o in outs:
        sync(o)
    dt = (time.perf_counter() - t0) / reps
    return batch_pairs * stack / dt


def main() -> None:
    from rift_tpu.data.registration_pairs import SyntheticPairs

    # Flagship shapes; env-overridable so a CPU smoke run stays cheap.
    n_points = int(os.environ.get("BENCH_POINTS", "1024"))
    batch_pairs = int(os.environ.get("BENCH_PAIRS", "64"))
    stack = int(os.environ.get("BENCH_STACK", "6"))  # batches per dispatch
    # r1-r4 series kernel = sph_dg; the round-4+ recommended flagship is
    # sph_pt (RANKING_r04). Both are measured and reported structurally
    # (VERDICT r4 #7) so the series survives methodology/kernel changes.
    series_kernel = os.environ.get("BENCH_KERNEL", "dgcnn")

    pairs = SyntheticPairs(num_pairs=batch_pairs, num_points=n_points,
                           mode="noise", max_amp=0.5)
    src = jnp.asarray(np.stack([pairs[i][0] for i in range(batch_pairs)]))
    dst = jnp.asarray(np.stack([pairs[i][1] for i in range(batch_pairs)]))

    stacked = _measure(series_kernel, src, dst, batch_pairs, stack)
    one_batch = _measure(series_kernel, src, dst, batch_pairs, 1)
    flagship = None
    if os.environ.get("BENCH_FLAGSHIP", "1") != "0" and \
            series_kernel == "dgcnn":
        flagship = _measure("pointnet", src, dst, batch_pairs, stack)

    out = {
        "metric": f"registered scan-pairs/s/chip ({n_points}-pt, "
                  "feat+match+GNC)",
        "value": round(stacked, 3),
        "unit": "pairs/s",
        "vs_baseline": round(stacked / _baseline_pairs_per_s(), 3),
        # Structural series fields (VERDICT r4 #7): the headline `value`
        # is the stacked-dispatch sph_dg number (comparable to BENCH_r04);
        # one_batch includes the full ~130 ms/dispatch tunnel overhead per
        # 64-pair batch (comparable to the r1-r3 methodology).
        "kernel": f"sph_{'dg' if series_kernel == 'dgcnn' else 'pt'}",
        "stack": stack,
        "stacked_pairs_per_s": round(stacked, 3),
        "one_batch_pairs_per_s": round(one_batch, 3),
    }
    if flagship is not None:
        out["flagship_kernel"] = "sph_pt"
        out["flagship_stacked_pairs_per_s"] = round(flagship, 3)
    if (n_points, batch_pairs) != (1024, 64) or "BENCH_KERNEL" in os.environ:
        # The stored denominator was measured at the default dgcnn/1024/64
        # config; flag overridden runs so their ratio is not misread.
        out["vs_baseline_note"] = ("baseline measured at the default "
                                   "dgcnn/1024pt/64pair config")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
