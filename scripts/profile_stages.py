"""Per-stage timing of the registration pipeline on the real TPU.

Times each stage of bench.py's register_batch separately (normals, model
forward, matching, GNC) plus a breakdown of the model forward (preprocess,
local-PPF branch, backbone) so optimization effort lands on the real hot spot.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
        jnp.sum(jax.tree.leaves(r)[0]).block_until_ready()
        float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        float(jnp.sum(jax.tree.leaves(o)[0]))
    return (time.perf_counter() - t0) / reps


def main():
    from rift_tpu.data.registration_pairs import SyntheticPairs
    from rift_tpu.models import PVCNNClassifier
    from rift_tpu.ops.normals import estimate_normals
    from rift_tpu.ops.neighbors import (
        ball_query, grouping, mutual_nearest_neighbors)
    from rift_tpu.ops.ppf import global_ppf, local_ppf
    from rift_tpu.ops.lrf import change_coords
    from rift_tpu.registration import gnc_pose

    n, bp = 1024, 64
    model = PVCNNClassifier(
        blocks=((64, 1, 32), (128, 1, 32), (256, 1, None), (512, 1, None)),
        dim_k=512, is_classify=False,
        point_kernel_formal="dgcnn_kernel", voxel_shape="spherical",
        rot_invariant_preprocess="change_coords", with_local_feat="ppf",
        extra_feature_channels=4, local_neighbors=128,
        with_coeff=True, with_se=True, dtype="bfloat16",
    )
    pairs = SyntheticPairs(num_pairs=bp, num_points=n, mode="noise", max_amp=0.5)
    src = jnp.asarray(np.stack([pairs[i][0] for i in range(bp)]))
    dst = jnp.asarray(np.stack([pairs[i][1] for i in range(bp)]))
    clouds = jnp.concatenate([src, dst], 0)  # [128, n, 3]

    sample = jnp.concatenate([src[:1], jnp.zeros_like(src[:1])], -1)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)

    normals_fn = jax.jit(estimate_normals)
    t_norm = timeit(normals_fn, clouds)
    nrm = normals_fn(clouds)
    x = jnp.concatenate([clouds, nrm], -1)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    t_fwd = timeit(fwd, variables, x)
    feats = fwd(variables, x)

    def match_gnc(src, dst, f1, f2):
        def one(s, d, fs, fd):
            i1, i2, mask = mutual_nearest_neighbors(fs, fd)
            t, _ = gnc_pose(s[i1], d[i2], mask, noise_bound=0.02)
            return t
        return jax.vmap(one)(src, dst, f1, f2)

    f_src, f_dst = feats[:bp], feats[bp:]
    t_match = timeit(jax.jit(match_gnc), src, dst, f_src, f_dst)

    # Forward sub-stages (outside flax, same shapes/dtypes).
    ctr = clouds - jnp.mean(clouds, -2, keepdims=True)
    t_lrf = timeit(jax.jit(change_coords), ctr)
    t_gppf = timeit(jax.jit(global_ppf), ctr, nrm)

    def local_branch(c, nm):
        idx = ball_query(c, c, 0.3, 128)
        nbr = grouping(jnp.concatenate([c, nm], -1), idx)
        return local_ppf(nbr[..., :3], nbr[..., 3:], c, nm)

    t_local_geo = timeit(jax.jit(local_branch), ctr, nrm)

    def bq_only(c):
        return ball_query(c, c, 0.3, 128)
    t_bq = timeit(jax.jit(bq_only), ctr)

    total = t_norm + t_fwd + t_match
    print(f"normals      {t_norm*1e3:8.2f} ms")
    print(f"forward      {t_fwd*1e3:8.2f} ms")
    print(f"  lrf(change_coords) {t_lrf*1e3:8.2f} ms")
    print(f"  global_ppf         {t_gppf*1e3:8.2f} ms")
    print(f"  ball_query only    {t_bq*1e3:8.2f} ms")
    print(f"  local geo (bq+grp+ppf) {t_local_geo*1e3:8.2f} ms")
    print(f"match+gnc    {t_match*1e3:8.2f} ms")
    print(f"TOTAL        {total*1e3:8.2f} ms -> {bp/total:.1f} pairs/s (stage-sum)")


if __name__ == "__main__":
    main()
