#!/usr/bin/env python
"""Dispatch-floor-free stage timing (round 4, third wave).

The tunnel dispatches cost ~25 ms/call, so per-fn wall timings (microbench
1/2) are `max(floor, device)` and saturate for anything cheaper than the
floor. Here every candidate runs K times INSIDE one jitted program (a
lax.scan whose carry perturbs the input, defeating CSE); device time per
application is the slope between K=K_LO and K=K_HI runs — the floor and
sync cost cancel.

Usage: python scripts/microbench3.py {floor,match3,gnc3,normals3,conv3,localppf3,all}
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_HI = lax.Precision.HIGHEST
K_LO, K_HI = 2, 10


def wall(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fn(*args))
    return (time.perf_counter() - t0) / reps


def slope_time(stage, x, reps=3, *data):
    """stage: (x_perturbed, *data) -> scalar. Returns per-application ms.

    Any large arrays MUST be passed via *data (jit arguments): closed-over
    jnp arrays are baked into the HLO as constants, and a 100+ MB program
    body blows the tunnel's remote-compile request limit (HTTP 413).
    """
    def many(k):
        @jax.jit
        def f(x, *data):
            def body(c, i):
                return c + stage(x + c * 1e-12 + i * 1e-6, *data), None
            s, _ = lax.scan(body, jnp.zeros((), jnp.float32),
                            jnp.arange(k, dtype=jnp.float32))
            return s
        return f

    t_lo = wall(many(K_LO), x, *data, reps=reps)
    t_hi = wall(many(K_HI), x, *data, reps=reps)
    return (t_hi - t_lo) / (K_HI - K_LO) * 1e3, t_lo * 1e3


def cloud(b=128, n=1024, seed=0):
    rng = np.random.RandomState(seed)
    c = rng.randn(b, n, 3).astype(np.float32) * 0.3
    nm = rng.randn(b, n, 3).astype(np.float32)
    nm /= np.linalg.norm(nm, axis=-1, keepdims=True)
    return jnp.asarray(c), jnp.asarray(nm)


def report(tag, stage, x, reps, *data):
    ms, lo = slope_time(stage, x, reps, *data)
    print(f"{tag:28s} {ms:8.2f} ms/app   (K={K_LO} wall {lo:7.1f} ms)")


# --------------------------------------------------------------------------
def mode_floor(args):
    @jax.jit
    def tiny(x):
        return jnp.sum(x) * 1.000001

    x = jnp.ones((8, 128), jnp.float32)
    t = wall(tiny, x, reps=10)
    print(f"floor/dispatch+sync per call: {t*1e3:8.2f} ms")


# --------------------------------------------------------------------------
def mode_match3(args):
    from rift_tpu.ops.neighbors import mutual_nearest_neighbors

    rng = np.random.RandomState(0)
    b, n = 64, args.points
    f1 = jnp.asarray(rng.randn(b, n, 512).astype(np.float32))
    f2 = jnp.asarray(rng.randn(b, n, 512).astype(np.float32))

    def shipped(x, f1, f2):
        i1, i2, m = jax.vmap(mutual_nearest_neighbors)(f1 + x, f2)
        return jnp.sum(i2) * 1e-9 + jnp.sum(m)

    report("match3/shipped", shipped, jnp.zeros(()), args.reps, f1, f2)

    def bf16_match(x, f1, f2):
        a = (f1 + x).astype(jnp.bfloat16)
        bb = f2.astype(jnp.bfloat16)
        d = (jnp.sum(f1**2, -1, keepdims=True)
             + jnp.sum(f2**2, -1)[:, None, :]
             - 2.0 * lax.dot_general(
                 a, bb, (((2,), (2,)), ((0,), (0,))),
                 preferred_element_type=jnp.float32))
        c12 = jnp.argmin(d, -1)
        c21 = jnp.argmin(d, -2)
        mask = jnp.take_along_axis(c21, c12, -1) == jnp.arange(
            n, dtype=c12.dtype)
        return jnp.sum(c12) * 1e-9 + jnp.sum(mask)

    report("match3/bf16", bf16_match, jnp.zeros(()), args.reps, f1, f2)

    def min_iota(x, f1, f2):
        from rift_tpu.ops.neighbors import pairwise_sqdist

        d = pairwise_sqdist(f1 + x, f2)
        iota = jnp.arange(n, dtype=jnp.int32)
        m12 = jnp.min(d, -1, keepdims=True)
        c12 = jnp.min(jnp.where(d <= m12, iota, n), -1)
        m21 = jnp.min(d, -2, keepdims=True)
        c21 = jnp.min(jnp.where(d <= m21, iota[:, None], n), -2)
        mask = jnp.take_along_axis(c21, c12, -1) == iota
        return jnp.sum(c12) * 1e-9 + jnp.sum(mask)

    report("match3/min_iota", min_iota, jnp.zeros(()), args.reps, f1, f2)


# --------------------------------------------------------------------------
def mode_gnc3(args):
    from rift_tpu.registration.gnc import gnc_pose

    rng = np.random.RandomState(0)
    bp, n = 64, args.points
    src = rng.randn(bp, n, 3).astype(np.float32) * 0.3
    dst = src @ np.linalg.qr(rng.randn(3, 3))[0].T + 0.1
    dst += rng.randn(*dst.shape).astype(np.float32) * 0.01
    out = rng.rand(bp, n) < 0.3
    dst[out] = rng.randn(int(out.sum()), 3) * 0.3
    src, dst = jnp.asarray(src), jnp.asarray(dst.astype(np.float32))
    valid = jnp.asarray(rng.rand(bp, n) < 0.5)

    def make(early):
        def s(x):
            T = jax.vmap(lambda s, d, v: gnc_pose(
                s, d, v, early_exit=early)[0])(src + x, dst, valid)
            return jnp.sum(T)
        return s

    report("gnc3/while_early", make(True), jnp.zeros(()), args.reps)
    report("gnc3/scan100", make(False), jnp.zeros(()), args.reps)


# --------------------------------------------------------------------------
def mode_normals3(args):
    from rift_tpu.ops.normals import estimate_normals

    coords, _ = cloud(args.batch, args.points)

    def s(x):
        return jnp.sum(estimate_normals(coords + x))

    report("normals3/shipped(hier)", s, jnp.zeros(()), args.reps)

    def s_nohybrid(x):
        return jnp.sum(estimate_normals(coords + x, min_neighbors=0))

    report("normals3/no_hybrid", s_nohybrid, jnp.zeros(()), args.reps)


# --------------------------------------------------------------------------
def mode_conv3(args):
    rng = np.random.RandomState(0)
    b, r, c = args.batch, 32, 64
    x0 = jnp.asarray(rng.randn(b, r, r, r, c).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w = jnp.asarray((rng.randn(3, 3, 3, c, c) * 0.05).astype(np.float32)
                    ).astype(jnp.bfloat16)
    flops = b * r**3 * 27 * c * c * 2

    def conv3d(x, x0, w):
        y = lax.conv_general_dilated(
            (x0 + x.astype(jnp.bfloat16)), w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        return jnp.sum(y) * 1e-9

    ms, _ = slope_time(conv3d, jnp.zeros(()), args.reps, x0, w)
    print(f"conv3/conv3d    {ms:8.2f} ms/app  MFU={flops/(ms*1e-3)/197e12:5.1%}")

    def zshift(x, x0, w):
        xx = x0 + x.astype(jnp.bfloat16)
        xp = jnp.pad(xx, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        acc = None
        for dz in range(3):
            xs = lax.slice_in_dim(xp, dz, dz + r, axis=1).reshape(
                b * r, r, r, c)
            y = lax.conv_general_dilated(
                xs, w[dz], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        return jnp.sum(acc) * 1e-9

    ms, _ = slope_time(zshift, jnp.zeros(()), args.reps, x0, w)
    print(f"conv3/zshift    {ms:8.2f} ms/app  MFU={flops/(ms*1e-3)/197e12:5.1%}")


# --------------------------------------------------------------------------
def mode_localppf3(args):
    from rift_tpu.ops.neighbors import ball_query_group
    from rift_tpu.ops.ppf import local_ppf

    k, radius = 128, 0.3
    coords, normals = cloud(args.batch, args.points)
    rng = np.random.RandomState(1)
    w1 = jnp.asarray(rng.randn(4, 32).astype(np.float32) * 0.5)
    w2 = jnp.asarray(rng.randn(32, 64).astype(np.float32) * 0.3)

    def mlp(f):
        h = jax.nn.relu((f.astype(jnp.bfloat16) @ w1.astype(jnp.bfloat16)
                         ).astype(jnp.float32))
        return jax.nn.relu((h.astype(jnp.bfloat16) @ w2.astype(jnp.bfloat16)
                            ).astype(jnp.float32))

    def shipped(x):
        c = coords + x
        nbr, ok = ball_query_group(
            c, c, jnp.concatenate([c, normals], -1), radius, k)
        feats = local_ppf(nbr[..., :3], nbr[..., 3:], c, normals)
        return jnp.sum(jnp.max(jnp.where(ok[..., None], mlp(feats), -jnp.inf),
                               -2)) * 1e-9

    report("localppf3/shipped", shipped, jnp.zeros(()), args.reps)

    from rift_tpu.ops.ppf import local_ppf_grouped_fast

    def fast(x):
        c = coords + x
        feats, ok = local_ppf_grouped_fast(c, normals, radius, k)
        return jnp.sum(jnp.max(jnp.where(ok[..., None], mlp(feats), -jnp.inf),
                               -2)) * 1e-9

    report("localppf3/fast", fast, jnp.zeros(()), args.reps)


MODES = {"floor": mode_floor, "match3": mode_match3, "gnc3": mode_gnc3,
         "normals3": mode_normals3, "conv3": mode_conv3,
         "localppf3": mode_localppf3}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=list(MODES) + ["all"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    for name, fn in MODES.items():
        if args.mode in (name, "all"):
            print(f"== {name} ==")
            try:
                fn(args)
            except Exception as e:  # noqa: BLE001
                print(f"{name} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
