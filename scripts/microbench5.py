#!/usr/bin/env python
"""Round-5 wave 2: counting-route local-PPF vs the shipped fused path.

The shipped eval path (`ops/ppf.py:local_ppf_grouped_fast`) pays ~50 ms at
flagship shapes for the [n, u, n] slot-selector contraction (u=128). This
bench measures a structurally different route that never builds a u-wide
selector over pair space:

  1. d2 + inclusive rank IR (triangular bf16 matmul — already shipped)
  2. idx[i, s] = sum_j [min(IR[i,j], u) <= s]  -- a fused compare-reduce
     (the (s+1)-th valid neighbor index by COUNTING, no sort, no top_k)
  3. one row-gather of concat(coords, normals) at idx (one-hot MXU matmul)
  4. exact f32 local_ppf on the gathered [b, n, u, 3] pairs

Unlike the fused path this reproduces the reference composition EXACTLY
(f32, no reassociation), so if it wins it can replace the train path and
`ball_query` itself (whose lax.top_k costs ~44 ms at these shapes) too.

Usage: python scripts/microbench5.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

K_LO, K_HI = 2, 6
_HI = lax.Precision.HIGHEST

B, N, U = 128, 1024, 128
RADIUS = 0.3


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
        print(f"{tag:40s} {ms:8.2f} ms/app", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag:40s} FAILED {type(e).__name__}: {e}", flush=True)


# ---------------------------------------------------------------- pieces

def incl_rank(valid):
    n = valid.shape[-1]
    tri = jnp.tril(jnp.ones((n, n), jnp.bfloat16), 0)  # inclusive
    return lax.dot_general(
        valid.astype(jnp.bfloat16), tri,
        (((valid.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def idx_by_counting(ir, u):
    """idx[i, s] = #(j : min(IR[i,j], u) <= s) for s in 0..u-1 (f32)."""
    irc = jnp.minimum(ir, float(u)).astype(jnp.bfloat16)  # values <= 128: exact
    s = jnp.arange(u, dtype=jnp.bfloat16)
    le = (irc[..., None, :] <= (s[:, None] + 0.5))  # [b, n, u, n]
    return jnp.sum(le, axis=-1, dtype=jnp.float32)  # reduce over lanes


def ball_idx_counting(coords, radius, u):
    d2 = pairwise_sqdist(coords, coords)
    valid = (d2 < radius * radius) & (d2 > 1e-5)
    ir = incl_rank(valid)
    idx = idx_by_counting(ir, u)  # [b, n, u] f32; == n where slot empty
    cnt = ir[..., -1]
    empty = idx >= N  # slot beyond cnt
    first = idx[..., :1]
    idx = jnp.where(empty, jnp.broadcast_to(first, idx.shape), idx)
    nearest = jnp.argmin(d2, axis=-1).astype(jnp.float32)[..., None]
    idx = jnp.where((cnt < 0.5)[..., None], jnp.broadcast_to(nearest, idx.shape), idx)
    return idx.astype(jnp.int32), cnt


def pairwise_sqdist(a, b):
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    cross = jnp.einsum("...nc,...mc->...nm", a, b, precision=_HI)
    return jnp.maximum(a2 + jnp.swapaxes(b2, -1, -2) - 2.0 * cross, 0.0)


def gather_onehot(v, idx, precision):
    """v [b, n, c], idx [b, m] int -> [b, m, c] via one-hot matmul."""
    n = v.shape[-2]
    oh = jax.nn.one_hot(idx, n, dtype=v.dtype)
    return jnp.einsum("...mn,...nc->...mc", oh, v, precision=precision)


def local_ppf_exact(nbr_c, nbr_n, c, nrm):
    d = c[..., None, :] - nbr_c
    d_norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    d_unit = d / jnp.maximum(d_norm, 1e-20)
    nc = nrm[..., None, :]
    ang = lambda a, b: jnp.arccos(jnp.clip(jnp.sum(a * b, -1), -1., 1.))  # noqa: E731
    return jnp.stack([
        ang(nbr_n, d_unit),
        ang(jnp.broadcast_to(nc, d_unit.shape), d_unit),
        ang(nbr_n, jnp.broadcast_to(nc, nbr_n.shape)),
        d_norm[..., 0]], axis=-1)


def counting_route(coords, normals, precision):
    idx, cnt = ball_idx_counting(coords, RADIUS, U)
    v = jnp.concatenate([coords, normals], -1)
    b, n, u = idx.shape
    g = gather_onehot(v, idx.reshape(b, n * u), precision).reshape(b, n, u, 6)
    feats = local_ppf_exact(g[..., :3], g[..., 3:], coords, normals)
    slot_valid = jnp.arange(u) < jnp.maximum(cnt, 1.0)[..., None]
    return feats, slot_valid


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    # Surface-like clouds (cluster mixture): local densities vary so both
    # the >u truncation and the sparse-row padding branches are exercised.
    centers = rng.normal(size=(B, 12, 3)).astype(np.float32) * 0.5
    pick = rng.integers(0, 12, size=(B, N))
    pts = centers[np.arange(B)[:, None], pick]
    pts += rng.normal(size=(B, N, 3)).astype(np.float32) * 0.15
    pts -= pts.mean(1, keepdims=True)
    pts /= np.abs(pts).max((1, 2), keepdims=True)
    nrm = rng.normal(size=(B, N, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    coords = jnp.asarray(pts)
    normals = jnp.asarray(nrm)

    # neighbor-count stats (affects how often padding branches hit)
    d2 = pairwise_sqdist(coords[:4], coords[:4])
    v = (d2 < RADIUS * RADIUS) & (d2 > 1e-5)
    c = np.asarray(jnp.sum(v, -1))
    print(f"valid-neighbor count: mean {c.mean():.0f} med {np.median(c):.0f} "
          f">u frac {(c > U).mean():.2f}", flush=True)

    # ---- correctness vs the shipped composition
    from rift_tpu.ops.neighbors import ball_query, grouping
    from rift_tpu.ops.ppf import local_ppf, local_ppf_grouped_fast

    small_c, small_n = coords[:4], normals[:4]
    idx_ref = ball_query(small_c, small_c, RADIUS, U)
    idx_new, cnt = jax.jit(ball_idx_counting, static_argnums=(1, 2))(small_c, RADIUS, U)
    print("idx exact equal:", bool(jnp.all(idx_ref == idx_new)), flush=True)

    nbr = grouping(jnp.concatenate([small_c, small_n], -1), idx_ref)
    feats_ref = local_ppf(nbr[..., :3], nbr[..., 3:], small_c, small_n)
    for prec, name in [(_HI, "HIGHEST"), (lax.Precision.HIGH, "HIGH"),
                       (lax.Precision.DEFAULT, "DEFAULT")]:
        feats_new, _ = jax.jit(counting_route, static_argnums=(2,))(small_c, small_n, prec)
        ok = bool(jnp.all(feats_ref == feats_new))
        md = float(jnp.max(jnp.abs(feats_ref - feats_new)))
        print(f"feats[{name}] bit-equal: {ok}  maxdiff {md:.2e}", flush=True)

    # ---- timing
    reps = 2
    report("shipped local_ppf_grouped_fast",
           lambda x, c, n: jnp.sum(local_ppf_grouped_fast(
               c + x, n, RADIUS, U)[0].astype(jnp.float32)),
           reps, coords, normals)
    report("counting route e2e (HIGHEST)",
           lambda x, c, n: jnp.sum(counting_route(c + x, n, _HI)[0]),
           reps, coords, normals)
    report("counting route e2e (HIGH)",
           lambda x, c, n: jnp.sum(counting_route(c + x, n, lax.Precision.HIGH)[0]),
           reps, coords, normals)
    # pieces
    report("  d2+valid+tri-rank",
           lambda x, c: jnp.sum(incl_rank(
               (pairwise_sqdist(c + x, c + x) < RADIUS**2))),
           reps, coords)
    ir = incl_rank((pairwise_sqdist(coords, coords) < RADIUS**2)
                   & (pairwise_sqdist(coords, coords) > 1e-5))
    report("  idx_by_counting",
           lambda x, i: jnp.sum(idx_by_counting(i + x, U)),
           reps, ir)
    idx, _ = jax.jit(ball_idx_counting, static_argnums=(1, 2))(coords, RADIUS, U)
    vfeat = jnp.concatenate([coords, normals], -1)
    flat = idx.reshape(B, N * U)
    report("  gather one-hot HIGHEST",
           lambda x, v, i: jnp.sum(gather_onehot(v + x, i, _HI)),
           reps, vfeat, flat)
    report("  gather one-hot HIGH",
           lambda x, v, i: jnp.sum(gather_onehot(v + x, i, lax.Precision.HIGH)),
           reps, vfeat, flat)
    g = gather_onehot(vfeat, flat, _HI).reshape(B, N, U, 6)
    report("  ppf epilogue",
           lambda x, gg, c, n: jnp.sum(local_ppf_exact(
               gg[..., :3] + x, gg[..., 3:], c, n)),
           reps, g, coords, normals)


if __name__ == "__main__":
    main()
