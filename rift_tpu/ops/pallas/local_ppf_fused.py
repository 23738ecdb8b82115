"""Fused local-PPF feature kernel: ball query + PPF + MLP + max in one pass.

The reference's local feature branch (`PVCNN/models/pvcnn_classify.py:252-271`)
is ball_query (`ball_query.cu:19-50`) -> neighbor gather (`grouping.cu:18-36`)
-> 4-d PPF -> SharedMLP(32, 64) -> max over k. Composed from separate XLA ops
that costs three full passes over [b, n, k, ·] HBM intermediates plus an
n×k one-hot gather. This kernel computes the identical function in a single
Pallas pass with NO HBM intermediates:

- all pairwise geometry comes from four [TI,3]x[TJ,3] gram matmuls (MXU),
  never a gather: d², n_j·d̂, n_i·d̂, n_i·n_j are closed-form in the grams;
- the ball-query rule "keep the first `u` in-radius points in index order"
  becomes an exclusive prefix-sum of the validity mask along j, computed as
  a strictly-lower-triangular matmul (MXU) plus a running per-row counter
  carried in VMEM scratch across j-tiles;
- the eval-mode SharedMLP (Dense+BatchNorm folded to one affine per layer)
  runs on the MXU per (i,j)-tile and is max-reduced immediately, so the
  [TI,TJ,64] activations never leave VMEM;
- the MLP's contractions are K=4 and K=32 — 3-25% MXU lane utilization if
  issued naively (this dominated the v1 kernel's runtime). Both layers are
  therefore packed to dense K=128: G consecutive pair-rows fold into one
  MXU row via a contiguous reshape ([R,4] -> [R/32,128]), multiplied by a
  block-diagonal weight matrix with G copies of W on the diagonal, and the
  output unfolds with another contiguous reshape — no cross-lane shuffles,
  2.7x fewer MXU block passes;
- points with no in-radius neighbor fall back to the PPF of their nearest
  point (first index on ties), exactly like `ops.neighbors.ball_query`'s
  fallback — tracked as a running (min d², its PPF) pair in scratch.

acos is not lowerable by Mosaic, so it is implemented branchlessly from the
musl asinf rational minimax (~1e-7 abs err; XLA's own acos differs from the
true value by a similar margin).

Semantics parity is tested against the unfused composition in
tests/test_pallas_ops.py. Interpret mode keeps it CPU-runnable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_PI = 3.14159265358979323846
_PI_2 = _PI / 2.0


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _acos(x: Array) -> Array:
    """Branchless float32 acos on [-1, 1] (musl asinf minimax, ~1e-7 abs)."""
    pS0, pS1, pS2 = 1.6666586697e-01, -4.2743422091e-02, -8.6563630030e-03
    qS1 = -7.0662963390e-01

    def R(z):
        return z * (pS0 + z * (pS1 + z * pS2)) / (1.0 + z * qS1)

    ax = jnp.abs(x)
    small = _PI_2 - (x + x * R(x * x))
    z = (1.0 - ax) * 0.5
    s = jnp.sqrt(z)
    big_pos = 2.0 * (s + s * R(z))
    big = jnp.where(x < 0.0, _PI - big_pos, big_pos)
    return jnp.where(ax < 0.5, small, big)


def _kernel(ci_ref, ni_ref, cj_ref, nj_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            w1p_ref, b1p_ref, w2p_ref, b2p_ref,
            out_ref, run_max, cnt, best_d2, best_ppf,
            *, radius: float, max_neighbors: int, ti: int, tj: int,
            k1: int, k2: int, mlp_dtype: jnp.dtype):
    j = pl.program_id(2)
    nj_tiles = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        run_max[...] = jnp.full_like(run_max, -1.0)
        cnt[...] = jnp.zeros_like(cnt)
        best_d2[...] = jnp.full_like(best_d2, jnp.inf)
        best_ppf[...] = jnp.zeros_like(best_ppf)

    ci = ci_ref[0]  # [TI, 3]
    ni = ni_ref[0]
    cj = cj_ref[0]  # [TJ, 3]
    njn = nj_ref[0]

    def dot_last(a, b):  # [p,3]x[q,3] -> [p,q] on the MXU
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    ones_row = jnp.ones((1, 3), jnp.float32)
    cc = dot_last(ci, cj)       # c_i·c_j
    cinj = dot_last(ci, njn)    # c_i·n_j
    nicj = dot_last(ni, cj)     # n_i·c_j
    ninj = dot_last(ni, njn)    # n_i·n_j
    ci2 = jnp.sum(ci * ci, axis=1, keepdims=True)       # [TI,1]
    nici = jnp.sum(ni * ci, axis=1, keepdims=True)      # [TI,1]
    cj2_row = dot_last(ones_row, cj * cj)               # [1,TJ]
    njcj_row = dot_last(ones_row, njn * cj)             # [1,TJ]

    # PPF planes (d = c_i - c_j, matching local_ppf's center - neighbor).
    d2 = jnp.maximum(ci2 + cj2_row - 2.0 * cc, 0.0)
    dn = jnp.sqrt(d2)
    inv = 1.0 / jnp.maximum(dn, 1e-20)
    clip = lambda v: jnp.clip(v, -1.0, 1.0)
    a1 = _acos(clip((cinj - njcj_row) * inv))   # ∠(n_nbr, d̂)
    a2 = _acos(clip((nici - nicj) * inv))       # ∠(n_ctr, d̂)
    a3 = _acos(clip(ninj))                      # ∠(n_nbr, n_ctr)

    # Ball-query rule: first `max_neighbors` valid (in j index order).
    valid = (d2 > 1e-5) & (d2 < radius * radius)
    v = valid.astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (tj, tj), 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (tj, tj), 1)
    lt = (col < row).astype(jnp.float32)        # strictly lower triangular
    rank = cnt[:, 0:1] + jnp.dot(v, lt, preferred_element_type=jnp.float32)
    keep = valid & (rank < float(max_neighbors))
    cnt[...] = cnt[...] + jnp.sum(v, axis=1, keepdims=True)

    # Folded MLP on the MXU with dense-K packing: every reshape below is
    # contiguous (row-major flat order is unchanged), so Mosaic lowers them
    # without cross-lane shuffles.
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    h2 = w2.shape[1]
    rows = ti * tj
    pmat = jnp.stack([a1, a2, a3, dn], axis=-1)            # [TI, TJ, 4]
    pmat = pmat.reshape(rows // k1, k1 * 4)                # K = 128 dense
    hid = jnp.dot(pmat.astype(mlp_dtype), w1p_ref[...],
                  preferred_element_type=jnp.float32) + b1p_ref[0][None, :]
    hid = jnp.maximum(hid, 0.0)                            # [R/k1, k1*H1]
    hid = hid.reshape(rows // k2, k2 * w1.shape[1])        # K = 128 dense
    out = jnp.dot(hid.astype(mlp_dtype), w2p_ref[...],
                  preferred_element_type=jnp.float32) + b2p_ref[0][None, :]
    out = jnp.maximum(out, 0.0).reshape(ti, tj, h2)

    # Arithmetic masking (Mosaic cannot minor-dim-broadcast an i1 mask):
    # keep=1 -> out (>=0 post-ReLU), keep=0 -> -1 sentinel.
    keep_f = keep.astype(jnp.float32)[:, :, None]
    masked = out * keep_f + (keep_f - 1.0)
    run_max[...] = jnp.maximum(run_max[...], jnp.max(masked, axis=1))

    # Nearest-point fallback tracking (first index on ties, like argmin).
    tile_min = jnp.min(d2, axis=1, keepdims=True)        # [TI,1]
    at_min = (d2 == tile_min).astype(jnp.float32)
    min_rank = jnp.dot(at_min, lt, preferred_element_type=jnp.float32)
    first = at_min * (min_rank == 0.0).astype(jnp.float32)

    def pick(plane):  # PPF value at the first in-tile argmin, per row
        return jnp.sum(plane * first, axis=1, keepdims=True)

    cand = jnp.concatenate([pick(a1), pick(a2), pick(a3), pick(dn)], axis=1)
    improved = tile_min < best_d2[:, 0:1]
    best_d2[...] = jnp.where(improved, tile_min, best_d2[...])
    best_ppf[...] = jnp.where(improved, cand, best_ppf[...])

    @pl.when(j == nj_tiles - 1)
    def _():
        fb = jnp.dot(best_ppf[...].astype(mlp_dtype), w1.astype(mlp_dtype),
                     preferred_element_type=jnp.float32) + b1_ref[0][None, :]
        fb = jnp.maximum(fb, 0.0)
        fb = jnp.dot(fb.astype(mlp_dtype), w2.astype(mlp_dtype),
                     preferred_element_type=jnp.float32) + b2_ref[0][None, :]
        fb = jnp.maximum(fb, 0.0)
        has = cnt[:, 0:1] > 0.0
        out_ref[0] = jnp.where(has, run_max[...], fb)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "max_neighbors", "ti", "tj", "precision"))
def local_ppf_fused(coords: Array, normals: Array,
                    w1: Array, b1: Array, w2: Array, b2: Array,
                    radius: float, max_neighbors: int,
                    ti: int = 128, tj: int = 128,
                    precision: str = "bf16") -> Array:
    """max_k relu(A2·relu(A1·ppf(i, k) + b1) + b2) over ball-query neighbors.

    coords/normals [b, n, 3] f32 (normals as given — not re-normalized, like
    the unfused path); w1 [4, H1], b1 [H1], w2 [H1, H2], b2 [H2] — the
    eval-mode Dense+BatchNorm affines, pre-folded. Returns [b, n, H2] f32.

    precision: 'bf16' runs the two MLP matmuls at bf16 (f32 accumulate, MXU
    rate — matches a SharedMLP with dtype=bfloat16); 'f32' keeps them f32
    (bit-comparable to the unfused f32 path, ~3x slower on the MXU).

    Requires n % ti == 0 and n % tj == 0 (callers fall back to the unfused
    path otherwise).
    """
    b, n, _ = coords.shape
    assert n % ti == 0 and n % tj == 0, (n, ti, tj)
    h1 = w1.shape[1]
    h2 = w2.shape[1]
    # Dense-K MXU packing: k1 pair-rows share one L1 MXU row (K = 4*k1 =
    # 128), k2 rows share one L2 row (K = h1*k2 = 128). Requires h1 | 128.
    assert h1 <= 128 and 128 % h1 == 0, h1
    k1 = 128 // 4
    k2 = 128 // h1
    assert (ti * tj) % k1 == 0 and (ti * tj) % k2 == 0, (ti, tj, h1)
    mlp_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32

    def block_diag(w, copies):
        """[a, b] -> [copies*a, copies*b] with `w` on the diagonal."""
        eye = jnp.eye(copies, dtype=w.dtype)
        a, c = w.shape
        return jnp.einsum("st,qc->sqtc", eye, w).reshape(copies * a, copies * c)

    w1p = block_diag(w1, k1).astype(mlp_dtype)   # [128, k1*h1]
    w2p = block_diag(w2, k2).astype(mlp_dtype)   # [128, k2*h2]
    b1p = jnp.tile(b1, k1)[None, :]
    b2p = jnp.tile(b2, k2)[None, :]

    kernel = functools.partial(
        _kernel, radius=float(radius), max_neighbors=int(max_neighbors),
        ti=ti, tj=tj, k1=k1, k2=k2, mlp_dtype=mlp_dtype)
    rep = lambda *_: (0, 0)
    return pl.pallas_call(
        kernel,
        grid=(b, n // ti, n // tj),
        in_specs=[
            pl.BlockSpec((1, ti, 3), lambda bi, i, j: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, 3), lambda bi, i, j: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj, 3), lambda bi, i, j: (bi, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj, 3), lambda bi, i, j: (bi, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, h1), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h1), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, h2), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((128, k1 * h1), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k1 * h1), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((128, k2 * h2), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k2 * h2), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ti, h2), lambda bi, i, j: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, h2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ti, h2), jnp.float32),   # running max
            pltpu.VMEM((ti, 1), jnp.float32),    # valid count so far
            pltpu.VMEM((ti, 1), jnp.float32),    # best (min) d² so far
            pltpu.VMEM((ti, 4), jnp.float32),    # its PPF
        ],
        interpret=not _on_tpu(),
    )(coords[:, :, :], normals, coords, normals,
      w1, b1[None, :], w2, b2[None, :], w1p, b1p, w2p, b2p)


def fold_dense_bn(kernel: Array, bias: Array, scale: Array, bn_bias: Array,
                  mean: Array, var: Array, eps: float = 1e-5
                  ) -> tuple[Array, Array]:
    """Fold eval-mode BatchNorm into the preceding Dense: y = x·W' + b'."""
    sigma = jnp.sqrt(var + eps)
    g = scale / sigma
    return kernel * g[None, :], (bias - mean) * g + bn_bias
