#!/usr/bin/env python
"""Round-4 wave 4: slope-timed breakdown of the FULL bench forward.

Known stages (slope-timed, v5e, 128 clouds x 1024 pts): normals 20.0,
local-PPF fast 46.3, convs ~35, matching 3.9, GNC 2.0 ms — yet the bench
program spends ~328 ms per 64-pair batch. This mode slope-times the whole
jitted register program and its forward sub-pieces to locate the rest
(voxelize/devox scatter paths, LRF, global PPF, dgcnn gather, MLP glue).

Usage: python scripts/microbench4.py {fwd,pieces,all}
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

K_LO, K_HI = 2, 6


def wall(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fn(*args))
    return (time.perf_counter() - t0) / reps


def slope_time(stage, reps, *data):
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
    t_lo = wall(many(K_LO), x, *data, reps=reps)
    t_hi = wall(many(K_HI), x, *data, reps=reps)
    return (t_hi - t_lo) / (K_HI - K_LO) * 1e3


def report(tag, stage, reps, *data):
    try:
        ms = slope_time(stage, reps, *data)
        print(f"{tag:32s} {ms:8.2f} ms/app")
    except Exception as e:  # noqa: BLE001
        print(f"{tag:32s} FAILED {type(e).__name__}: {e}")


def _model(dtype="bfloat16", local="ppf"):
    from rift_tpu.models import PVCNNClassifier

    return PVCNNClassifier(
        blocks=((64, 1, 32), (128, 1, 32), (256, 1, None), (512, 1, None)),
        dim_k=512, is_classify=False,
        point_kernel_formal="dgcnn_kernel", voxel_shape="spherical",
        rot_invariant_preprocess="change_coords", with_local_feat=local,
        extra_feature_channels=4, local_neighbors=128,
        with_coeff=True, with_se=True, dtype=dtype)


def mode_fwd(args):
    from rift_tpu.ops.normals import estimate_normals

    rng = np.random.RandomState(0)
    b, n = args.batch, args.points
    clouds = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)

    model = _model()
    x_probe = jnp.concatenate([clouds[:1], estimate_normals(clouds[:1])], -1)
    v = model.init(jax.random.PRNGKey(0), x_probe, train=False)

    def full_fwd(x, clouds, v):
        c = clouds + x
        xx = jnp.concatenate([c, estimate_normals(c)], -1)
        return jnp.sum(model.apply(v, xx, train=False)) * 1e-9

    report("fwd/normals+forward", full_fwd, args.reps, clouds, v)

    model_nl = _model(local=None)
    v_nl = model_nl.init(jax.random.PRNGKey(0), x_probe, train=False)

    def fwd_nolocal(x, clouds, v_nl):
        c = clouds + x
        xx = jnp.concatenate([c, estimate_normals(c)], -1)
        return jnp.sum(model_nl.apply(v_nl, xx, train=False)) * 1e-9

    report("fwd/no_local_branch", fwd_nolocal, args.reps, clouds, v_nl)


def mode_pieces(args):
    from rift_tpu.ops.lrf import change_coords, lrf_basis
    from rift_tpu.ops.pallas.spherical_fast import (
        spherical_avg_voxelize_fast, spherical_trilinear_devoxelize_fast)
    from rift_tpu.ops.ppf import global_ppf
    from rift_tpu.ops.spherical import (spherical_avg_voxelize,
                                        spherical_trilinear_devoxelize)

    rng = np.random.RandomState(0)
    b, n, r = args.batch, args.points, 32
    coords = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)
    normals = rng.randn(b, n, 3).astype(np.float32)
    normals = jnp.asarray(
        normals / np.linalg.norm(normals, axis=-1, keepdims=True))
    feat64 = jnp.asarray(rng.randn(b, n, 64).astype(np.float32)
                         ).astype(jnp.bfloat16)
    feat128 = jnp.asarray(rng.randn(b, n, 128).astype(np.float32)
                          ).astype(jnp.bfloat16)

    def vox64(x, feat64, coords):
        g, i, nc = spherical_avg_voxelize_fast(feat64, coords + x, r)
        return jnp.sum(g.astype(jnp.float32)) * 1e-9 + jnp.sum(nc) * 1e-12

    report("pieces/sph_vox_fast_c64", vox64, args.reps, feat64, coords)

    def vox128(x, feat128, coords):
        g, i, nc = spherical_avg_voxelize_fast(feat128, coords + x, r)
        return jnp.sum(g.astype(jnp.float32)) * 1e-9 + jnp.sum(nc) * 1e-12

    report("pieces/sph_vox_fast_c128", vox128, args.reps, feat128, coords)

    def vox64_xla(x, feat64, coords):
        g, i, nc = spherical_avg_voxelize(feat64, coords + x, r)
        return jnp.sum(g.astype(jnp.float32)) * 1e-9 + jnp.sum(nc) * 1e-12

    report("pieces/sph_vox_xla_c64", vox64_xla, args.reps, feat64, coords)

    grid, inds, ncs = spherical_avg_voxelize_fast(feat64, coords, r)
    grid = grid.astype(jnp.bfloat16)

    def devox(x, grid, ncs, inds):
        out = spherical_trilinear_devoxelize_fast(
            grid + x.astype(grid.dtype), ncs, inds, r)
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    report("pieces/sph_devox_fast_c64", devox, args.reps, grid, ncs, inds)

    def devox_xla(x, grid, ncs, inds):
        out = spherical_trilinear_devoxelize(
            grid + x.astype(grid.dtype), ncs, inds, r)
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    report("pieces/sph_devox_xla_c64", devox_xla, args.reps, grid, ncs, inds)

    def lrf(x, coords):
        basis = lrf_basis(coords + x, "reference")
        return jnp.sum(change_coords(coords + x, basis)) * 1e-9

    report("pieces/lrf+change_coords", lrf, args.reps, coords)

    def gppf(x, coords, normals):
        return jnp.sum(global_ppf(coords + x, normals)) * 1e-9

    report("pieces/global_ppf", gppf, args.reps, coords, normals)

    # dgcnn center gather: [b, r^3, c] by inds [b, n]
    flat = jnp.asarray(rng.randn(b, r**3, 64).astype(np.float32)
                       ).astype(jnp.bfloat16)

    def dg(x, flat, inds):
        safe = jnp.maximum(inds, 0)
        center = jnp.take_along_axis(flat + x.astype(flat.dtype),
                                     safe[..., None], axis=-2)
        return jnp.sum(center.astype(jnp.float32)) * 1e-9

    report("pieces/dgcnn_row_gather", dg, args.reps, flat, inds)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["fwd", "pieces", "register", "all"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    if args.mode in ("fwd", "all"):
        print("== fwd ==")
        mode_fwd(args)
    if args.mode in ("pieces", "all"):
        print("== pieces ==")
        mode_pieces(args)
    if args.mode in ("register", "all"):
        print("== register ==")
        mode_register(args)




def mode_register(args):
    """Slope-time the bench's full register_batch program (the decisive
    number: parts sum to ~205 ms but the bench observes ~330 ms/batch)."""
    from rift_tpu.ops.neighbors import mutual_nearest_neighbors
    from rift_tpu.ops.normals import estimate_normals
    from rift_tpu.registration import gnc_pose

    rng = np.random.RandomState(0)
    bp, n = args.batch // 2, args.points
    src = jnp.asarray(rng.randn(bp, n, 3).astype(np.float32) * 0.3)
    dst = jnp.asarray(rng.randn(bp, n, 3).astype(np.float32) * 0.3)
    model = _model()
    probe = jnp.concatenate([src[:1], estimate_normals(src[:1])], -1)
    v = model.init(jax.random.PRNGKey(0), probe, train=False)

    def register(x, src, dst, v):
        clouds = jnp.concatenate([src + x, dst], 0)
        xx = jnp.concatenate([clouds, estimate_normals(clouds)], -1)
        feats = model.apply(v, xx, train=False)
        f_src, f_dst = feats[:bp], feats[bp:]

        def one(s, d, fs, fd):
            i1, i2, m = mutual_nearest_neighbors(fs, fd)
            t, _ = gnc_pose(s[i1], d[i2], m, noise_bound=0.02)
            return t

        t = jax.vmap(one)(src + x, dst, f_src, f_dst)
        return jnp.sum(t) * 1e-6

    report("register/full_batch", register, args.reps, src, dst, v)


if __name__ == "__main__":
    main()
