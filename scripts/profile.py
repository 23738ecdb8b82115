#!/usr/bin/env python
"""One parameterized TPU timing tool (replaces the ad-hoc profile_* scripts).

Modes:
  stages    per-stage timing of the registration pipeline (normals, forward,
            matching, GNC) + forward breakdown (preprocess, local branch,
            backbone) so optimization effort lands on the real hot spot;
  local     local-PPF branch variants head-to-head: unfused (top-k ball
            query) vs rank-select composition;
  backbone  PVConv backbone sub-ops at flagship shapes (spherical voxelize /
            devoxelize, conv3d pair, dgcnn gather, normals, LRF, global PPF).

Shapes are flags so measurements at non-flagship sizes don't require a new
script: --batch/--points/--neighbors/--radius/--resolution.

Usage: python scripts/profile.py stages [--batch 128] [--points 1024] ...
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5, warmup=2):
    # Host-fetch sync: block_until_ready returns at *dispatch* on the
    # tunneled TPU backend (see bench.py), so float() is the only barrier.
    for _ in range(warmup):
        r = fn(*args)
        float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


def _cloud(args):
    rng = np.random.RandomState(0)
    coords = jnp.asarray(
        rng.randn(args.batch, args.points, 3).astype(np.float32) * 0.3)
    normals = rng.randn(args.batch, args.points, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    return coords, jnp.asarray(normals)


def mode_local(args):
    from rift_tpu.ops.neighbors import ball_query, ball_query_group, grouping
    from rift_tpu.ops.ppf import local_ppf

    k, radius = args.neighbors, args.radius
    coords, normals = _cloud(args)
    rng = np.random.RandomState(1)
    w1 = jnp.asarray(rng.randn(4, 32).astype(np.float32) * 0.5)
    b1 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(32, 64).astype(np.float32) * 0.3)
    b2 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)

    def mlp(f):
        h = jax.nn.relu(
            (f.astype(jnp.bfloat16) @ w1.astype(jnp.bfloat16))
            .astype(jnp.float32) + b1)
        return jax.nn.relu(
            (h.astype(jnp.bfloat16) @ w2.astype(jnp.bfloat16))
            .astype(jnp.float32) + b2)

    @jax.jit
    def unfused(c, nm):
        idx = ball_query(c, c, radius, k)
        nbr = grouping(jnp.concatenate([c, nm], -1), idx)
        feats = local_ppf(nbr[..., :3], nbr[..., 3:], c, nm)
        return jnp.max(mlp(feats), axis=-2)

    @jax.jit
    def rank_select(c, nm):
        nbr, ok = ball_query_group(
            c, c, jnp.concatenate([c, nm], -1), radius, k)
        feats = local_ppf(nbr[..., :3], nbr[..., 3:], c, nm)
        return jnp.max(jnp.where(ok[..., None], mlp(feats), -jnp.inf),
                       axis=-2)

    for name, fn in [("unfused(topk)", unfused), ("rank_select", rank_select)]:
        t = timeit(fn, coords, normals, reps=args.reps)
        print(f"{name:16s} {t * 1e3:8.2f} ms")
    a, b = unfused(coords, normals), rank_select(coords, normals)
    print("rank_select max abs diff vs unfused:",
          float(jnp.max(jnp.abs(a - b))))


def mode_backbone(args):
    import flax.linen as nn

    from rift_tpu.models import PVCNNClassifier
    from rift_tpu.ops.normals import estimate_normals
    from rift_tpu.ops.pallas.spherical_fast import (
        spherical_avg_voxelize_fast, spherical_trilinear_devoxelize_fast)
    from rift_tpu.ops.lrf import change_coords
    from rift_tpu.ops.ppf import global_ppf

    b, r = args.batch, args.resolution
    coords, _ = _cloud(args)
    rng = np.random.RandomState(1)
    feat64 = jnp.asarray(
        rng.randn(b, args.points, 64).astype(np.float32)).astype(jnp.bfloat16)
    x6 = jnp.concatenate([coords, coords], -1)

    model_nl = PVCNNClassifier(
        blocks=((64, 1, 32), (128, 1, 32), (256, 1, None), (512, 1, None)),
        dim_k=512, is_classify=False,
        point_kernel_formal="dgcnn_kernel", voxel_shape="spherical",
        rot_invariant_preprocess="change_coords", with_local_feat=None,
        extra_feature_channels=4, with_coeff=True, with_se=True,
        dtype="bfloat16")
    v = model_nl.init(jax.random.PRNGKey(0), x6[:1], train=False)
    t = timeit(jax.jit(lambda v, x: model_nl.apply(v, x, train=False)),
               v, x6, reps=args.reps)
    print(f"forward(no local)  {t * 1e3:8.2f} ms")

    t = timeit(jax.jit(lambda f, c: spherical_avg_voxelize_fast(f, c, r)),
               feat64, coords, reps=args.reps)
    print(f"sph_vox_fast c=64  {t * 1e3:8.2f} ms")
    grid, inds, nc = spherical_avg_voxelize_fast(feat64, coords, r)
    t = timeit(jax.jit(lambda g, ncc, i:
                       spherical_trilinear_devoxelize_fast(g, ncc, i, r)),
               grid.astype(jnp.float32), nc, inds, reps=args.reps)
    print(f"sph_devox_fast     {t * 1e3:8.2f} ms")

    class TwoConv(nn.Module):
        @nn.compact
        def __call__(self, v):
            for _ in range(2):
                v = nn.Conv(64, (3, 3, 3), padding="SAME",
                            dtype=jnp.bfloat16)(v)
                v = nn.leaky_relu(v, 0.1)
            return v

    tc = TwoConv()
    gv = grid.reshape(b, r, r, r, 64)
    vv = tc.init(jax.random.PRNGKey(0), gv[:1])
    t = timeit(jax.jit(lambda vv, g: tc.apply(vv, g)), vv, gv, reps=args.reps)
    print(f"conv3d x2 c=64     {t * 1e3:8.2f} ms")

    flat = grid.reshape(b, r * r * r, 64)

    def dg(flat, inds):
        return jnp.take_along_axis(flat, jnp.maximum(inds, 0)[..., None],
                                   axis=-2)

    t = timeit(jax.jit(dg), flat, inds, reps=args.reps)
    print(f"dgcnn row gather   {t * 1e3:8.2f} ms")

    for name, fn, fargs in [
        ("estimate_normals", jax.jit(estimate_normals), (coords,)),
        ("change_coords", jax.jit(change_coords), (coords,)),
        ("global_ppf", jax.jit(global_ppf),
         (coords, estimate_normals(coords))),
    ]:
        t = timeit(fn, *fargs, reps=args.reps)
        print(f"{name:18s} {t * 1e3:8.2f} ms")


def mode_stages(args):
    from rift_tpu.data.registration_pairs import SyntheticPairs
    from rift_tpu.models import PVCNNClassifier
    from rift_tpu.ops.normals import estimate_normals
    from rift_tpu.ops.neighbors import mutual_nearest_neighbors
    from rift_tpu.registration.gnc import gnc_pose

    b, n = args.batch, args.points
    pairs = SyntheticPairs(num_points=n, mode="noise", num_pairs=b, seed=0)
    batch = next(pairs.batches(batch_size=b))
    src = jnp.asarray(batch.source)
    dst = jnp.asarray(batch.target)
    clouds = jnp.concatenate([src, dst], 0)

    model = PVCNNClassifier(
        blocks=((64, 1, 32), (128, 1, 32), (256, 1, None), (512, 1, None)),
        dim_k=512, is_classify=False,
        point_kernel_formal="dgcnn_kernel", voxel_shape="spherical",
        rot_invariant_preprocess="change_coords", with_local_feat="ppf",
        extra_feature_channels=4, with_coeff=True, with_se=True,
        dtype="bfloat16")
    x_probe = jnp.concatenate([clouds[:1], estimate_normals(clouds[:1])], -1)
    v = model.init(jax.random.PRNGKey(0), x_probe, train=False)

    t_nrm = timeit(jax.jit(estimate_normals), clouds, reps=args.reps)
    x = jnp.concatenate([clouds, estimate_normals(clouds)], -1)
    t_fwd = timeit(jax.jit(lambda v, x: model.apply(v, x, train=False)),
                   v, x, reps=args.reps)
    feats = model.apply(v, x, train=False)
    f_src, f_dst = feats[:b], feats[b:]
    t_match = timeit(jax.jit(jax.vmap(mutual_nearest_neighbors)),
                     f_src, f_dst, reps=args.reps)
    i1, i2, m = jax.vmap(mutual_nearest_neighbors)(f_src, f_dst)
    s = jnp.take_along_axis(src, i1[..., None], axis=-2)
    d = jnp.take_along_axis(dst, i2[..., None], axis=-2)
    t_gnc = timeit(
        jax.jit(jax.vmap(lambda s, d, m: gnc_pose(s, d, m)[0])),
        s, d, m, reps=args.reps)
    total = t_nrm + t_fwd + t_match + t_gnc
    for name, t in [("normals", t_nrm), ("forward", t_fwd),
                    ("matching", t_match), ("gnc", t_gnc)]:
        print(f"{name:10s} {t * 1e3:8.2f} ms  ({100 * t / total:4.1f}%)")
    print(f"{'total':10s} {total * 1e3:8.2f} ms  "
          f"-> {b / total:8.1f} pairs/s (upper bound, no host overhead)")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=("stages", "local", "backbone"))
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--neighbors", type=int, default=128)
    ap.add_argument("--radius", type=float, default=0.3)
    ap.add_argument("--resolution", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    {"stages": mode_stages, "local": mode_local,
     "backbone": mode_backbone}[args.mode](args)


if __name__ == "__main__":
    main()
