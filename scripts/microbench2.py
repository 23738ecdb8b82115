#!/usr/bin/env python
"""Round-4 micro-benchmarks, second wave: in-situ breakdowns of the stages
whose first-wave variants did not explain the time (see microbench.py):

  match2    — where do matching's 30 ms go? (matmul vs the two argmins;
              where-iota-min argmin; transposed second matmul)
  conv2     — conv3d decompositions (conv2d ceiling probe, z-shift conv2d)
  localppf2 — piecewise cost of ball_query_group (d2/cumsum/selector/MLP)
              + rank-via-triangular-matmul variant
  gnc2      — transform-fixed-point exit vs weight-fixed-point exit
  normals2  — estimate_normals with the hierarchical exact-kth
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_HI = lax.Precision.HIGHEST


def timeit(fn, *args, reps=5, warmup=2):
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


# --------------------------------------------------------------------------
def mode_match2(args):
    from rift_tpu.ops.neighbors import mutual_nearest_neighbors, pairwise_sqdist

    rng = np.random.RandomState(0)
    b, n = min(64, args.batch), args.points
    f1 = jnp.asarray(rng.randn(b, n, 512).astype(np.float32))
    f2 = jnp.asarray(rng.randn(b, n, 512).astype(np.float32))

    @jax.jit
    def d2_only(f1, f2):
        return pairwise_sqdist(f1, f2)

    @jax.jit
    def d2_amin_last(f1, f2):
        return jnp.argmin(pairwise_sqdist(f1, f2), -1)

    @jax.jit
    def d2_amin_first(f1, f2):
        return jnp.argmin(pairwise_sqdist(f1, f2), -2)

    @jax.jit
    def shipped(f1, f2):
        return jax.vmap(mutual_nearest_neighbors)(f1, f2)

    @jax.jit
    def min_iota(f1, f2):
        d = pairwise_sqdist(f1, f2)
        iota = jnp.arange(n, dtype=jnp.int32)
        m12 = jnp.min(d, -1, keepdims=True)
        c12 = jnp.min(jnp.where(d <= m12, iota, n), -1)
        m21 = jnp.min(d, -2, keepdims=True)
        c21 = jnp.min(jnp.where(d <= m21, iota[:, None], n), -2)
        mask = jnp.take_along_axis(c21, c12, -1) == iota
        return c12, mask

    @jax.jit
    def two_matmuls(f1, f2):
        # row argmin from d; col argmin from the *transposed product* —
        # both reduces run over the fast (last) axis.
        d = pairwise_sqdist(f1, f2)
        dt = pairwise_sqdist(f2, f1)
        c12 = jnp.argmin(d, -1)
        c21 = jnp.argmin(dt, -1)
        iota = jnp.arange(n, dtype=c12.dtype)
        mask = jnp.take_along_axis(c21, c12, -1) == iota
        return c12, mask

    ref_c, ref_m = shipped(f1, f2)[1], shipped(f1, f2)[2]
    for name, fn in [("d2_only", d2_only), ("d2+amin_last", d2_amin_last),
                     ("d2+amin_first", d2_amin_first), ("shipped", shipped),
                     ("min_iota", min_iota), ("two_matmuls", two_matmuls)]:
        t = timeit(fn, f1, f2, reps=args.reps)
        note = ""
        if name in ("min_iota", "two_matmuls"):
            c, m = fn(f1, f2)
            note = f"  mismatches={int(jnp.sum((c != ref_c) | (m != ref_m)))}"
        print(f"match2/{name:14s} {t*1e3:8.2f} ms{note}")


# --------------------------------------------------------------------------
def mode_conv2(args):
    rng = np.random.RandomState(0)
    b, r, c = args.batch, 32, 64
    x = jnp.asarray(rng.randn(b, r, r, r, c).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray((rng.randn(3, 3, 3, c, c) * 0.05).astype(np.float32)
                    ).astype(jnp.bfloat16)
    flops = b * r**3 * 27 * c * c * 2

    @jax.jit
    def conv3d(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    x2d = x.reshape(b * r, r, r, c)
    w2d = w[1]

    @jax.jit
    def conv2d_probe(x2d, w2d):  # MFU ceiling of a plain 3x3 conv2d
        return lax.conv_general_dilated(
            x2d, w2d, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def zshift(x, w):
        # conv3d = sum over dz of conv2d(z-shifted x, w[dz]) with the z axis
        # folded into the batch: three well-shaped conv2ds instead of one
        # badly-tiled conv3d.
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        acc = None
        for dz in range(3):
            xs = lax.slice_in_dim(xp, dz, dz + r, axis=1).reshape(b * r, r, r, c)
            y = lax.conv_general_dilated(
                xs, w[dz], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        return acc.reshape(b, r, r, r, -1).astype(jnp.bfloat16)

    ref = conv3d(x, w)
    t = timeit(conv3d, x, w, reps=args.reps)
    print(f"conv2/conv3d        {t*1e3:8.2f} ms  MFU={flops/t/197e12:5.1%}")
    t = timeit(conv2d_probe, x2d, w2d, reps=args.reps)
    print(f"conv2/conv2d_probe  {t*1e3:8.2f} ms  MFU={flops/3/t/197e12:5.1%}"
          " (1/3 of the taps)")
    t = timeit(zshift, x, w, reps=args.reps)
    dif = float(jnp.max(jnp.abs((zshift(x, w) - ref).astype(jnp.float32))))
    print(f"conv2/zshift        {t*1e3:8.2f} ms  MFU={flops/t/197e12:5.1%}"
          f"  maxdiff={dif:.2e}")

    # f32 input variant (is the bf16 layout hurting the conv tiler?)
    xf, wf = x.astype(jnp.float32), w.astype(jnp.float32)

    @jax.jit
    def conv3d_f32(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    t = timeit(conv3d_f32, xf, wf, reps=args.reps)
    print(f"conv2/conv3d_f32    {t*1e3:8.2f} ms  MFU={flops/t/197e12:5.1%}")


# --------------------------------------------------------------------------
def mode_localppf2(args):
    from rift_tpu.ops.neighbors import pairwise_sqdist
    from rift_tpu.ops.ppf import local_ppf

    k, radius = min(128, args.points // 2), 0.3
    coords, normals = cloud(args.batch, args.points)
    n = args.points
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

    def masks_cumsum(c):
        d2 = pairwise_sqdist(c, c)
        valid = (d2 < radius * radius) & (d2 > 1e-5)
        vi = valid.astype(jnp.int32)
        rank = jnp.cumsum(vi, -1) - vi
        keep = valid & (rank < k)
        return keep, rank, valid, d2

    def masks_matmul(c):
        d2 = pairwise_sqdist(c, c)
        valid = (d2 < radius * radius) & (d2 > 1e-5)
        # exclusive prefix count as a triangular bf16 matmul: products are
        # 0/1 (exact), accumulation f32 -> exact rank, one MXU pass instead
        # of a log-depth cumsum over the 512 MB mask.
        tri = jnp.tril(jnp.ones((n, n), jnp.bfloat16), -1)
        rank = lax.dot_general(
            valid.astype(jnp.bfloat16), tri,
            (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        keep = valid & (rank < k)
        return keep, rank, valid, d2

    for name, fn in [("masks_cumsum", masks_cumsum),
                     ("masks_matmul", masks_matmul)]:
        jf = jax.jit(lambda c, f=fn: f(c)[0])
        t = timeit(jf, coords, reps=args.reps)
        print(f"localppf2/{name:16s} {t*1e3:8.2f} ms")
    same = bool(jnp.all(jax.jit(lambda c: masks_cumsum(c)[0])(coords)
                        == jax.jit(lambda c: masks_matmul(c)[0])(coords)))
    print(f"localppf2/rank_equal = {same}")

    def group_from(masks_fn):
        def f(c, nm):
            keep, rank, valid, d2 = masks_fn(c)
            cnt = jnp.sum(valid.astype(jnp.int32), -1)
            nearest = jnp.argmin(d2, -1)
            ar = jnp.arange(n, dtype=jnp.int32)
            fallback = (cnt == 0)[..., None] & (ar == nearest[..., None])
            sel = keep | fallback
            slot = jnp.where(keep, rank, 0)
            s_iota = jnp.arange(k, dtype=jnp.int32)
            feats = jnp.concatenate([c, nm], -1)
            m3 = (sel[..., None, :] & (slot[..., None, :] == s_iota[:, None])
                  ).astype(feats.dtype)
            grouped = jnp.einsum("...mun,...nc->...muc", m3, feats,
                                 precision=_HI)
            slot_valid = s_iota < jnp.maximum(cnt, 1)[..., None]
            return grouped, slot_valid
        return f

    def full_from(masks_fn, sel_dtype=None):
        group = group_from(masks_fn)

        @jax.jit
        def f(c, nm):
            nbr, ok = group(c, nm)
            feats = local_ppf(nbr[..., :3], nbr[..., 3:], c, nm)
            return jnp.max(jnp.where(ok[..., None], mlp(feats), -jnp.inf), -2)
        return f

    @jax.jit
    def group_only(c, nm):
        return group_from(masks_cumsum)(c, nm)[0]

    @jax.jit
    def ppf_mlp_only(nbr, ok, c, nm):
        feats = local_ppf(nbr[..., :3], nbr[..., 3:], c, nm)
        return jnp.max(jnp.where(ok[..., None], mlp(feats), -jnp.inf), -2)

    t = timeit(group_only, coords, normals, reps=args.reps)
    print(f"localppf2/group_cumsum_full {t*1e3:8.2f} ms")
    nbr, ok = jax.jit(group_from(masks_cumsum))(coords, normals)
    t = timeit(ppf_mlp_only, nbr, ok, coords, normals, reps=args.reps)
    print(f"localppf2/ppf+mlp+max       {t*1e3:8.2f} ms")

    f_cum = full_from(masks_cumsum)
    f_mm = full_from(masks_matmul)
    ref = f_cum(coords, normals)
    for name, fn in [("full_cumsum", f_cum), ("full_rankmm", f_mm)]:
        t = timeit(fn, coords, normals, reps=args.reps)
        dif = float(jnp.max(jnp.abs(fn(coords, normals) - ref)))
        print(f"localppf2/{name:14s} {t*1e3:8.2f} ms  maxdiff={dif:.2e}")


# --------------------------------------------------------------------------
def mode_gnc2(args):
    from rift_tpu.registration.gnc import gnc_pose
    from rift_tpu.registration.kabsch import weighted_kabsch

    rng = np.random.RandomState(0)
    bp, n = min(64, args.batch), args.points
    src = rng.randn(bp, n, 3).astype(np.float32) * 0.3
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

    @jax.jit
    def shipped(s, d, v):
        return jax.vmap(lambda s, d, v: gnc_pose(s, d, v)[0])(s, d, v)

    def gnc_texit(s, d, valid, noise_bound=0.02, gnc_factor=1.4,
                  max_iterations=100, tol=1e-9):
        """Exit when the TRANSFORM is stationary (not the weights): points
        sitting exactly in the shrinking TLS band keep their continuous
        weight moving for ~log(1/eps) iterations while the pose has long
        stopped changing."""
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
            w = weights(T, mu)
            new_T = weighted_kabsch(s, d, w)
            done = (jnp.max(jnp.abs(new_T - T)) < tol) & (it > 0)
            return (new_T, mu * gnc_factor, w, it + 1, done)

        T, _, w_last, iters, _ = lax.while_loop(
            cond, body, (t0, mu0, w0, jnp.zeros((), jnp.int32),
                         jnp.zeros((), bool)))
        return T, iters

    @jax.jit
    def texit(s, d, v):
        return jax.vmap(lambda s, d, v: gnc_texit(s, d, v))(s, d, v)

    ref = shipped(src, dst, valid)
    t = timeit(shipped, src, dst, valid, reps=args.reps)
    print(f"gnc2/shipped_wexit  {t*1e3:8.2f} ms")
    for tol in (1e-9, 1e-7):
        @jax.jit
        def f(s, d, v, tol=tol):
            return jax.vmap(lambda s, d, v: gnc_texit(s, d, v, tol=tol)[0]
                            )(s, d, v)
        t = timeit(f, src, dst, valid, reps=args.reps)
        T = f(src, dst, valid)
        dif = float(jnp.max(jnp.abs(T - ref)))
        _, iters = texit(src, dst, valid)
        print(f"gnc2/texit_{tol:.0e}  {t*1e3:8.2f} ms  maxdiff={dif:.2e}"
              f"  max_iters={int(jnp.max(iters))}")


# --------------------------------------------------------------------------
def mode_normals2(args):
    from rift_tpu.ops.normals import estimate_normals

    coords, _ = cloud(args.batch, args.points)

    t = timeit(jax.jit(estimate_normals), coords, reps=args.reps)
    print(f"normals2/shipped    {t*1e3:8.2f} ms")
    ship = jax.jit(estimate_normals)(coords)
    # after the hier-kth lands in ops/normals.py this just re-times it;
    # before, it demonstrates the drop via the kth_groups argument if added.
    try:
        t = timeit(jax.jit(lambda c: estimate_normals(c)), coords,
                   reps=args.reps)
        same = bool(jnp.all(jax.jit(estimate_normals)(coords) == ship))
        print(f"normals2/current    {t*1e3:8.2f} ms  stable={same}")
    except TypeError:
        pass


MODES = {"match2": mode_match2, "conv2": mode_conv2,
         "localppf2": mode_localppf2, "gnc2": mode_gnc2,
         "normals2": mode_normals2}


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
