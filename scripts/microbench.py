#!/usr/bin/env python
"""Round-4 optimization micro-benchmarks (one experiment per roofline stage).

Each mode times candidate formulations of one hot stage from ROOFLINE_r03
(normals 2.0% SoL, local_ppf 7.8%, pvconv MFU 12.5/29.5%, matching 3.5%,
GNC 0.6%) head-to-head at flagship shapes, printing ms + exactness vs the
shipped implementation so the winner can be promoted with evidence.

Usage: python scripts/microbench.py {kth,match,conv,gnc,gather,localppf,all}
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_HI = lax.Precision.HIGHEST


def timeit(fn, *args, reps=5, warmup=2):
    # Sync via a host fetch of a device-reduced scalar: block_until_ready
    # returns at *dispatch* (not completion) on the tunneled TPU backend
    # (see bench.py), so float() is the only reliable barrier here.
    for _ in range(warmup):
        r = fn(*args)
        float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


def cloud(b=128, n=1024, seed=0):
    rng = np.random.RandomState(seed)
    c = rng.randn(b, n, 3).astype(np.float32) * 0.3
    nm = rng.randn(b, n, 3).astype(np.float32)
    nm /= np.linalg.norm(nm, axis=-1, keepdims=True)
    return jnp.asarray(c), jnp.asarray(nm)


def _d2(pts):
    from rift_tpu.ops.neighbors import pairwise_sqdist
    return pairwise_sqdist(pts, pts)


# --------------------------------------------------------------------------
def mode_kth(args):
    """Exact k-th smallest distance per row: full top_k vs hierarchical."""
    coords, _ = cloud(args.batch, args.points)
    k = 16
    n = args.points

    @jax.jit
    def full_topk(c):
        d2 = _d2(c)
        return -lax.top_k(-d2, k)[0][..., -1]

    def hier(groups):
        g = groups
        m = n // g

        @jax.jit
        def f(c):
            d2 = _d2(c)
            dr = d2.reshape(d2.shape[:-1] + (g, m))
            part = -lax.top_k(-dr, k)[0]        # [..., g, k] smallest per group
            cand = part.reshape(d2.shape[:-1] + (g * k,))
            return -lax.top_k(-cand, k)[0][..., -1]
        return f

    @jax.jit
    def full_sort(c):
        d2 = _d2(c)
        return jnp.sort(d2, axis=-1)[..., k - 1]

    ref = full_topk(coords)
    variants = [("full_topk", full_topk), ("sort", full_sort)]
    variants[1:1] = [(f"hier_g{g}", hier(g)) for g in (8, 16, 32)
                     if n // g >= k]
    for name, fn in variants:
        t = timeit(fn, coords, reps=args.reps)
        exact = bool(jnp.all(fn(coords) == ref))
        print(f"kth/{name:10s} {t*1e3:8.2f} ms  exact={exact}")

    # whole-op: estimate_normals with shipped code path
    from rift_tpu.ops.normals import estimate_normals
    t = timeit(jax.jit(estimate_normals), coords, reps=args.reps)
    print(f"kth/estimate_normals(shipped) {t*1e3:8.2f} ms")


# --------------------------------------------------------------------------
def mode_match(args):
    """Mutual-NN feature matching: f32 HIGHEST vs cheaper dot algorithms."""
    rng = np.random.RandomState(0)
    b = min(64, args.batch)
    f1 = jnp.asarray(rng.randn(b, args.points, 512).astype(np.float32))
    f2 = jnp.asarray(rng.randn(b, args.points, 512).astype(np.float32))

    def match_with(cross_fn):
        @jax.jit
        def f(f1, f2):
            a2 = jnp.sum(f1 * f1, -1, keepdims=True)
            b2 = jnp.sum(f2 * f2, -1, keepdims=True)
            d = a2 + jnp.swapaxes(b2, -1, -2) - 2.0 * cross_fn(f1, f2)
            c12 = jnp.argmin(d, -1)
            c21 = jnp.argmin(d, -2)
            mask = jnp.take_along_axis(c21, c12, -1) == jnp.arange(
                args.points, dtype=c12.dtype)
            return c12, mask
        return f

    def cross_prec(p):
        return lambda a, b: jnp.einsum("...nc,...mc->...nm", a, b, precision=p)

    def cross_algo(name):
        algo = getattr(lax.DotAlgorithmPreset, name)

        def f(a, b):
            return lax.dot_general(a, b, (((2,), (2,)), ((0,), (0,))),
                                   precision=algo)
        return f

    variants = [("HIGHEST", match_with(cross_prec(_HI))),
                ("DEFAULT", match_with(cross_prec(None)))]
    for algo_name in ("BF16_BF16_F32_X3", "BF16_BF16_F32_X6", "BF16_BF16_F32"):
        try:
            fn = match_with(cross_algo(algo_name))
            fn(f1[:1], f2[:1])  # compile probe
            variants.append((algo_name, fn))
        except Exception as e:  # noqa: BLE001
            print(f"match/{algo_name}: unsupported ({type(e).__name__})")
    ref_c, ref_m = variants[0][1](f1, f2)
    for name, fn in variants:
        t = timeit(fn, f1, f2, reps=args.reps)
        c, m = fn(f1, f2)
        dif = int(jnp.sum((c != ref_c) | (m != ref_m)))
        print(f"match/{name:18s} {t*1e3:8.2f} ms  mismatches={dif}"
              f"/{b*args.points}")


# --------------------------------------------------------------------------
def mode_conv(args):
    """Conv3d 3^3 on [b,32,32,32,c] bf16: flax/XLA vs 27-tap matmul."""
    import flax.linen as nn
    rng = np.random.RandomState(0)
    b, r = args.batch, 32
    for cin, cout in [(64, 64), (71, 64), (128, 128), (64, 128)]:
        x = jnp.asarray(rng.randn(b, r, r, r, cin).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = jnp.asarray((rng.randn(3, 3, 3, cin, cout) * 0.05
                         ).astype(np.float32)).astype(jnp.bfloat16)
        flops = b * r**3 * 27 * cin * cout * 2

        @jax.jit
        def xla_conv(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        @jax.jit
        def taps(x, w):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((b, r, r, r, cout), jnp.float32)
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        acc += jnp.einsum(
                            "bzyxc,cd->bzyxd",
                            lax.slice(xp, (0, dz, dy, dx, 0),
                                      (b, dz + r, dy + r, dx + r, cin)),
                            w[dz, dy, dx],
                            preferred_element_type=jnp.float32)
            return acc.astype(jnp.bfloat16)

        ref = xla_conv(x, w)
        for name, fn in [("xla_conv", xla_conv), ("taps27", taps)]:
            t = timeit(fn, x, w, reps=args.reps)
            mfu = flops / t / 197e12
            dif = float(jnp.max(jnp.abs((fn(x, w) - ref).astype(jnp.float32))))
            print(f"conv/{cin:3d}->{cout:3d} {name:9s} {t*1e3:8.2f} ms  "
                  f"MFU={mfu:5.1%}  maxdiff={dif:.2e}")


# --------------------------------------------------------------------------
def mode_gnc(args):
    """GNC-TLS schedules: while-loop early exit vs unrolled variants."""
    from rift_tpu.registration.gnc import gnc_pose
    from rift_tpu.registration.kabsch import weighted_kabsch

    rng = np.random.RandomState(0)
    bp, n = min(64, args.batch), args.points
    src = rng.randn(bp, n, 3).astype(np.float32) * 0.3
    # ground-truth rotations + 30% outliers + noise
    dst = np.empty_like(src)
    for i in range(bp):
        a = rng.randn(3)
        a /= np.linalg.norm(a)
        th = rng.uniform(0, np.pi)
        K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
        dst[i] = src[i] @ R.T + rng.randn(3) * 0.1
    dst += rng.randn(*dst.shape).astype(np.float32) * 0.005
    out = rng.rand(bp, n) < 0.3
    dst[out] = rng.randn(int(out.sum()), 3).astype(np.float32) * 0.3
    valid = jnp.asarray(rng.rand(bp, n) < 0.5)
    src, dst = jnp.asarray(src), jnp.asarray(dst)

    def run(early_exit, unroll_tag):
        @jax.jit
        def f(s, d, v):
            return jax.vmap(lambda s, d, v: gnc_pose(
                s, d, v, early_exit=early_exit)[0])(s, d, v)
        return f

    v_while = run(True, "")
    v_scan = run(False, "")

    # 4-step-unrolled while loop (same math; done checked every 4 iters)
    def gnc_unrolled(s, d, valid, noise_bound=0.02, gnc_factor=1.4,
                     max_iterations=100, block=4):
        c2 = noise_bound * noise_bound
        w0 = valid.astype(s.dtype)
        t0 = weighted_kabsch(s, d, w0)

        def resid2(T):
            rot, t = T[..., :3, :3], T[..., :3, 3]
            moved = jnp.einsum("...ij,...nj->...ni", rot, s) + t[..., None, :]
            return jnp.sum((moved - d) ** 2, -1)

        r2m = jnp.max(jnp.where(valid, resid2(t0), 0.0))
        mu0 = jnp.maximum(c2 / jnp.maximum(2.0 * r2m - c2, 1e-12), 1e-6)

        def weights(T, mu):
            r2 = resid2(T)
            th1 = (mu + 1.0) / mu * c2
            th2 = mu / (mu + 1.0) * c2
            w = jnp.where(r2 >= th1, 0.0,
                          jnp.where(r2 <= th2, 1.0,
                                    jnp.sqrt(c2 * mu * (mu + 1.0)
                                             / jnp.maximum(r2, 1e-20)) - mu))
            return w * valid

        def cond(carry):
            _, _, _, it, done = carry
            return (it < max_iterations) & ~done

        def body(carry):
            T, mu, w_prev, it, _ = carry
            for _ in range(block):
                w = weights(T, mu)
                T = weighted_kabsch(s, d, w)
                mu = mu * gnc_factor
            done = jnp.all(w == w_prev) & (it > 0)
            return (T, mu, w, it + block, done)

        T, _, _, _, _ = lax.while_loop(
            cond, body, (t0, mu0, w0, jnp.zeros((), jnp.int32),
                         jnp.zeros((), bool)))
        return T

    @jax.jit
    def v_unroll4(s, d, v):
        return jax.vmap(lambda s, d, v: gnc_unrolled(s, d, v))(s, d, v)

    ref = v_while(src, dst, valid)
    for name, fn in [("while_early", v_while), ("scan100", v_scan),
                     ("while_unroll4", v_unroll4)]:
        t = timeit(fn, src, dst, valid, reps=args.reps)
        T = fn(src, dst, valid)
        # rotation agreement with the shipped solver
        dif = float(jnp.max(jnp.abs(T - ref)))
        print(f"gnc/{name:14s} {t*1e3:8.2f} ms  maxdiff_vs_while={dif:.2e}")


# --------------------------------------------------------------------------
def mode_gather(args):
    """one-hot MXU gather: f32 HIGHEST vs split-bf16 exact vs DEFAULT."""
    rng = np.random.RandomState(0)
    b, n, m = args.batch, args.points, args.points * 128
    feats = jnp.asarray(rng.randn(b, n, 6).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (b, m)).astype(np.int32))

    def onehot_with(contract):
        @jax.jit
        def f(feats, idx):
            oh = jax.nn.one_hot(idx, n, dtype=feats.dtype)
            return contract(oh, feats)
        return f

    def c_prec(p):
        return lambda oh, f: jnp.einsum("...mn,...nc->...mc", oh, f,
                                        precision=p)

    def c_split3(oh, f):
        # exact f32 gather via 3 bf16 passes: f = hi + mid + lo exactly,
        # selector rows one-hot -> each pass exact in f32 accumulation.
        hi = f.astype(jnp.bfloat16)
        r1 = f - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        ohb = oh.astype(jnp.bfloat16)

        def mm(x):
            return jnp.einsum("...mn,...nc->...mc", ohb, x,
                              preferred_element_type=jnp.float32)
        return mm(hi) + mm(mid) + mm(lo)

    @jax.jit
    def take(feats, idx):
        return jnp.take_along_axis(feats, idx[..., None], axis=-2)

    variants = [("onehot_HI", onehot_with(c_prec(_HI))),
                ("onehot_DEF", onehot_with(c_prec(None))),
                ("onehot_split3", onehot_with(lambda oh, f: c_split3(oh, f))),
                ("take_along", take)]
    ref = variants[0][1](feats, idx)
    for name, fn in variants:
        t = timeit(fn, feats, idx, reps=args.reps)
        exact = bool(jnp.all(fn(feats, idx) == ref))
        print(f"gather/{name:14s} {t*1e3:8.2f} ms  exact={exact}")


# --------------------------------------------------------------------------
def mode_localppf(args):
    """Local-PPF branch: shipped rank-select vs matmul-PPF (gather-free)."""
    from rift_tpu.ops.neighbors import ball_query_group, pairwise_sqdist
    from rift_tpu.ops.ppf import local_ppf

    k, radius = min(128, args.points // 2), 0.3
    coords, normals = cloud(args.batch, args.points)
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
    def shipped(c, nm):
        nbr, ok = ball_query_group(
            c, c, jnp.concatenate([c, nm], -1), radius, k)
        feats = local_ppf(nbr[..., :3], nbr[..., 3:], c, nm)
        return jnp.max(jnp.where(ok[..., None], mlp(feats), -jnp.inf), -2)

    def matmul_ppf(chunk):
        """Gather-free: all four PPF channels from [n,n] dot-product maps;
        MLP + masked max streamed over j-chunks (no [m,u,n] selector)."""
        @jax.jit
        def f(c, nm):
            d2 = pairwise_sqdist(c, c)                       # [b, i, j]
            valid = (d2 < radius * radius) & (d2 > 1e-5)
            vi = valid.astype(jnp.int32)
            rank = jnp.cumsum(vi, -1) - vi
            keep = valid & (rank < k)
            cnt = jnp.sum(vi, -1)
            nearest = jnp.argmin(d2, -1)
            arange = jnp.arange(c.shape[-2], dtype=jnp.int32)
            fallback = (cnt == 0)[..., None] & (arange == nearest[..., None])
            keep = keep | fallback
            # dot maps (i = center, j = neighbor), d_ij = c_i - p_j
            nj_ci = jnp.einsum("...jc,...ic->...ji", nm, c, precision=_HI)
            nj_pj = jnp.sum(nm * c, -1)                      # [b, j]
            ni_ci = jnp.sum(nm * c, -1)                      # [b, i]
            ni_pj = jnp.einsum("...ic,...jc->...ij", nm, c, precision=_HI)
            ninj = jnp.einsum("...ic,...jc->...ij", nm, nm, precision=_HI)

            nchunks = c.shape[-2] // chunk

            def step(carry, jc):
                j0 = jc * chunk
                dn = jnp.sqrt(jnp.maximum(
                    lax.dynamic_slice_in_dim(d2, j0, chunk, -1), 0.0))
                inv = 1.0 / jnp.maximum(dn, 1e-20)
                a = lax.dynamic_slice_in_dim(
                    jnp.swapaxes(nj_ci, -1, -2), j0, chunk, -1) \
                    - lax.dynamic_slice_in_dim(nj_pj, j0, chunk, -1)[..., None, :]
                bb = ni_ci[..., :, None] - lax.dynamic_slice_in_dim(
                    ni_pj, j0, chunk, -1)
                cc = lax.dynamic_slice_in_dim(ninj, j0, chunk, -1)
                ang = lambda x: jnp.arccos(jnp.clip(x, -1.0, 1.0))
                feats = jnp.stack([ang(a * inv), ang(bb * inv), ang(cc), dn],
                                  -1)  # [b, i, chunk, 4]
                h = mlp(feats)
                kmask = lax.dynamic_slice_in_dim(keep, j0, chunk, -1)
                h = jnp.where(kmask[..., None], h, -jnp.inf)
                return jnp.maximum(carry, jnp.max(h, -2)), None

            init = jnp.full(c.shape[:-1] + (64,), -jnp.inf, jnp.float32)
            out, _ = lax.scan(step, init, jnp.arange(nchunks))
            return out
        return f

    ref = shipped(coords, normals)
    t = timeit(shipped, coords, normals, reps=args.reps)
    print(f"localppf/shipped    {t*1e3:8.2f} ms")
    for chunk in (128, 256, 1024):
        if chunk > args.points:
            continue
        fn = matmul_ppf(chunk)
        t = timeit(fn, coords, normals, reps=args.reps)
        dif = float(jnp.max(jnp.abs(fn(coords, normals) - ref)))
        print(f"localppf/matmul_c{chunk:<4d} {t*1e3:8.2f} ms  maxdiff={dif:.2e}")


MODES = {"kth": mode_kth, "match": mode_match, "conv": mode_conv,
         "gnc": mode_gnc, "gather": mode_gather, "localppf": mode_localppf}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=list(MODES) + ["all"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=5)
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
