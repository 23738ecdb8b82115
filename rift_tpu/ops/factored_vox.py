"""Factorized voxel scatter/gather — the round-5 vox/devox kernels.

The one-hot MXU kernels (ops/pallas/onehot_ops.py) made the scatter-mean /
trilinear-devoxelize family MXU contractions, but their selector build is
O(n·r³) VPU compares per cloud (~33.5 M at r=32, n=1024; ×8 corners for
devox) — measured VPU-bound at ~64 ms of the 123 ms pvconv pair
(ROOFLINE_r04). This module removes that cost structurally:

The flat voxel index ind = i₀·r² + i₁·r + i₂ *factorizes*: a one-hot over
r³ voxels is the outer product of a one-hot over the leading r² "hi" bins
(i₀·r + i₁) and one over the trailing r "lo" bins (i₂). Likewise the
trilinear corner weights are separable per axis (w = w₀·w₁·w₂). So

  scatter:  G[hi, lo, c] = Σ_n OH_hi[n, hi] · (OH_lo ⊗ F)[n, lo·c]
  gather:   out[n, c]    = Σ_lo W_lo[n, lo] · (W_hi @ G)[n, lo, c]

— one [n, r²] selector + one [n, r] selector (~1 M compares per cloud,
30× less than one-hot) and the heavy contraction is a dense
[n, r²] @ [r², r·c] matmul that rides the MXU. The hi/lo split is chosen
so the matmul output [hi, lo·c] IS the grid layout — no transpose.

Everything here is plain XLA (jit/vmap/grad-safe, runs on any backend);
semantics match `spherical_vox.cu` / `trilinear_devox.cu` /
`spherical_trilinear_devox.cu` via the same binning/corner rules as
ops/spherical.py and ops/voxelize.py (oracle-tested against both).

Precision: 0/1 selectors are exact in bf16 and scatter sums/counts
accumulate in f32, so voxel means are exact up to one final rounding into
the feature dtype. Devoxelize *weights* are fractional; for bf16 grids
they run at bf16 in one MXU pass (equivariance-safe — see _weight_matmul;
RIFT_DEVOX_SPLIT=1 selects a two-term bf16 split with ~f32 weight
precision for A/B checks). f32 grids use HIGHEST throughout.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST


def _precision_for(dtype) -> jax.lax.Precision:
    return _HI if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def split_index_onehots(inds: Array, resolution: int, dtype
                        ) -> tuple[Array, Array]:
    """Factor flat voxel indices into (hi, lo) one-hots.

    inds int32 [b, n] in [0, r³) with -1 marking dropped/undefined points
    (`spherical_vox.cu:103-105` rule: they match no voxel) ->
      (oh_hi [b, n, r²], oh_lo [b, n, r]) in `dtype`; undefined rows are
    all-zero in oh_hi so they vanish from every contraction.
    """
    r = resolution
    valid = inds >= 0
    safe = jnp.where(valid, inds, 0)
    hi = safe // r
    lo = safe % r
    iota_hi = jnp.arange(r * r, dtype=jnp.int32)
    iota_lo = jnp.arange(r, dtype=jnp.int32)
    oh_hi = ((hi[..., None] == iota_hi) & valid[..., None]).astype(dtype)
    oh_lo = (lo[..., None] == iota_lo).astype(dtype)
    return oh_hi, oh_lo


def scatter_mean_factored(features: Array, inds: Array, resolution: int
                          ) -> tuple[Array, Array]:
    """Deterministic scatter-mean over r³ voxels via factorized one-hots.

    features [b, n, c], inds int32 [b, n] (-1 = dropped) ->
      (out [b, r³, c] f32 voxel means, cnt [b, r³] f32 occupancy counts).

    Equals ops/voxelize.scatter_mean (and the CUDA `vox.cu` /
    `spherical_vox.cu` forward): out[v] = Σ feat[i]/cnt[v] over points in
    voxel v; empty voxels are zero. Counts are exact (0/1 operands, f32
    accumulation).
    """
    b, n, c = features.shape
    r = resolution
    prec = _precision_for(features.dtype)
    oh_hi, oh_lo = split_index_onehots(inds, r, features.dtype)
    cnt = jnp.einsum("bnh,bnl->bhl", oh_hi, oh_lo,
                     preferred_element_type=jnp.float32,
                     precision=prec).reshape(b, r * r * r)
    # Pre-scale each point by 1/cnt of ITS voxel (every point lands in
    # exactly one voxel), so the contraction emits voxel *means* directly
    # in the feature dtype — no f32 sums materialization and no separate
    # divide pass over the [b, r³, c] grid (measured ~2× on v5e).
    cnt_pt = jnp.take_along_axis(cnt, jnp.maximum(inds, 0), axis=-1)
    invc = jnp.where(cnt_pt > 0, 1.0 / jnp.maximum(cnt_pt, 1.0), 0.0)
    fs = (features.astype(jnp.float32) * invc[..., None]).astype(
        features.dtype)
    # Keep the channel axis minor and every reshape a non-minor split:
    # TPU tiles pad the minor dim to the lane width, so flattening (lo, c)
    # into one axis would physically re-tile ~0.5 GB/batch. The 4-D
    # dot_general below contracts n with free dims (lo, c) instead.
    t = oh_lo[..., :, None] * fs[..., None, :]          # [b, n, lo, c]
    out = jnp.einsum("bnh,bnlc->bhlc", oh_hi, t,
                     preferred_element_type=features.dtype,
                     precision=prec)
    # bf16 features -> bf16 voxel means: every consumer (conv stack, dgcnn
    # edge gather) casts to bf16 anyway. Counts stay exact f32.
    return out.reshape(b, r * r * r, c), cnt


def axis_weight_plane(lo_i: Array, hi_i: Array, frac: Array, size: int,
                      valid: Array | None = None) -> Array:
    """Weighted 2-hot interpolation plane for one grid axis.

    lo_i/hi_i int32 [b, n] (hi already clamped or wrapped by the caller),
    frac [b, n] in [0, 1) -> [b, n, size] f32 with (1-frac) at lo_i and
    frac at hi_i (summing when they coincide at a clamped boundary, which
    reproduces the duplicate-corner accumulation of the 8-corner loops).
    """
    i = jnp.arange(size, dtype=jnp.int32)
    w = ((lo_i[..., None] == i) * (1.0 - frac[..., None])
         + (hi_i[..., None] == i) * frac[..., None])
    if valid is not None:
        w = jnp.where(valid[..., None], w, 0.0)
    return w.astype(jnp.float32)


def combine_hi_planes(p0: Array, p1: Array) -> Array:
    """Outer-product two [b, n, r] axis planes into the [b, n, r²] hi
    selector (hi = i₀·r + i₁)."""
    b, n, r = p0.shape
    return (p0[..., :, None] * p1[..., None, :]).reshape(b, n, r * r)


# Process-start-only A/B toggle (read at import, like RIFT_FACTORED_VOX).
_SPLIT_WEIGHTS = os.environ.get("RIFT_DEVOX_SPLIT", "0") == "1"


def _weight_matmul(w: Array, g: Array, transpose_w: bool = False) -> Array:
    """W @ G with fractional weights against a possibly-bf16 grid.

    w [b, n, s], g [b, s, lo, c] -> [b, n, lo, c] (or wᵀ@g: contracting n
    when transpose_w, with g [b, n, lo, c] -> [b, s, lo, c]). The free
    dims stay (lo, c) so the minor channel axis is never re-tiled.

    bf16 grids: bf16 weights in one MXU pass (f32 accumulation). The ~0.4%
    weight quantization is equivariance-safe: features are matched between
    clouds *after* LRF canonicalization, so identical geometry sees
    identical grid coordinates and identical rounding — the noise cancels
    exactly where invariance matters. RIFT_DEVOX_SPLIT=1 enables a
    two-term bf16 split (value + residual ≈ f32 weight precision, 2×
    matmul cost) for A/B accuracy checks. f32 grids: one HIGHEST einsum.
    """
    eq = "bns,bslc->bnlc" if not transpose_w else "bns,bnlc->bslc"
    if g.dtype == jnp.bfloat16:
        w_hi = w.astype(jnp.bfloat16)
        if _SPLIT_WEIGHTS:
            w_lo = (w.astype(jnp.float32)
                    - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return (jnp.einsum(eq, w_hi, g,
                               preferred_element_type=jnp.float32)
                    + jnp.einsum(eq, w_lo, g,
                                 preferred_element_type=jnp.float32))
        return jnp.einsum(eq, w_hi, g, preferred_element_type=jnp.bfloat16)
    return jnp.einsum(eq, w.astype(g.dtype), g,
                      preferred_element_type=jnp.float32, precision=_HI)


def corner_gather_factored(grid_flat: Array, w_hi: Array, w_lo: Array,
                           resolution: int) -> Array:
    """Trilinear gather: out[n, c] = Σ_v W_hi[n, hi(v)]·W_lo[n, lo(v)]·G[v, c].

    grid_flat [b, r³, c], w_hi [b, n, r²], w_lo [b, n, r] -> [b, n, c] f32.
    Replaces the 8-row gather / one-hot gather kernels; backward is
    corner_scatter_factored (or plain AD — both are matmuls).
    """
    b, s, c = grid_flat.shape
    r = resolution
    g = grid_flat.reshape(b, r * r, r, c)          # non-minor split: free
    h = _weight_matmul(w_hi, g)                    # [b, n, r, c]
    return jnp.einsum("bnl,bnlc->bnc", w_lo, h,
                      preferred_element_type=jnp.float32)


def corner_scatter_factored(dout: Array, w_hi: Array, w_lo: Array,
                            resolution: int) -> Array:
    """Transpose of corner_gather_factored:
    dG[v, c] = Σ_n W_hi[n, hi(v)]·W_lo[n, lo(v)]·dout[n, c].

    dout [b, n, c], w_hi [b, n, r²], w_lo [b, n, r] -> [b, r³, c] in
    dout's matmul dtype (bf16 grads stay bf16). Mirrors the CUDA
    devoxelize backward
    (`spherical_trilinear_devox.cu:150-194` / `trilinear_devox.cu` grad
    kernel) as two matmuls.
    """
    b, n, c = dout.shape
    r = resolution
    t = w_lo[..., :, None] * dout[..., None, :].astype(jnp.float32)
    if dout.dtype == jnp.bfloat16:
        t = t.astype(jnp.bfloat16)
    dgrid = _weight_matmul(w_hi, t, transpose_w=True)  # [b, r², r, c]
    return dgrid.reshape(b, r * r * r, c)


# ------------------------------------------------------------------ #
# Differentiable wrappers with the CUDA-parity custom backward passes
# (cheaper than AD through the forward matmuls: the scatter backward is a
# row gather, `spherical_vox.cu:139-163` / `vox.cu:87-111`).


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def scatter_mean_diff(features: Array, inds: Array, resolution: int) -> Array:
    """scatter_mean_factored with backward = gather grad[ind]/cnt[ind]."""
    out, _ = scatter_mean_factored(features, inds, resolution)
    return out


def _scatter_mean_diff_fwd(features, inds, resolution):
    out, cnt = scatter_mean_factored(features, inds, resolution)
    return out, (inds, cnt, jnp.zeros((0,), features.dtype))


def _scatter_mean_diff_bwd(resolution, res, g):
    inds, cnt, proto = res
    safe = jnp.maximum(inds, 0)
    g_rows = jnp.take_along_axis(g, safe[..., None], axis=-2)
    cnt_rows = jnp.take_along_axis(cnt, safe, axis=-1)
    inv = jnp.where(cnt_rows > 0, 1.0 / jnp.maximum(cnt_rows, 1.0), 0.0)
    dfeat = jnp.where((inds >= 0)[..., None], g_rows * inv[..., None], 0.0)
    return dfeat.astype(proto.dtype), None


scatter_mean_diff.defvjp(_scatter_mean_diff_fwd, _scatter_mean_diff_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def corner_gather_diff(grid_flat: Array, w_hi: Array, w_lo: Array,
                       resolution: int) -> Array:
    """corner_gather_factored with backward = corner_scatter_factored
    (the CUDA devoxelize grad kernel as matmuls); no weight gradients —
    interpolation coords are detached in every caller, as in the
    reference."""
    return corner_gather_factored(grid_flat, w_hi, w_lo, resolution)


def _corner_gather_diff_fwd(grid_flat, w_hi, w_lo, resolution):
    out = corner_gather_factored(grid_flat, w_hi, w_lo, resolution)
    return out, (w_hi, w_lo, jnp.zeros((0,), grid_flat.dtype))


def _corner_gather_diff_bwd(resolution, res, g):
    w_hi, w_lo, proto = res
    dgrid = corner_scatter_factored(g.astype(proto.dtype), w_hi, w_lo,
                                    resolution)
    return dgrid.astype(proto.dtype), None, None


corner_gather_diff.defvjp(_corner_gather_diff_fwd, _corner_gather_diff_bwd)
