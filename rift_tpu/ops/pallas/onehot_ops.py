"""Pallas TPU kernels: scatter/gather as one-hot MXU contractions.

STATUS (round 5): superseded as the default fast path by the FACTORIZED
formulation (ops/factored_vox.py — the r³ one-hot splits into an
(r²-hi ⊗ r-lo) selector pair, ~30× less VPU selector work; measured
vox 14→5 ms, devox 17.9→7.7 ms at flagship shapes). These kernels remain
the RIFT_FACTORED_VOX=0 A/B path and a second oracle in tests.

The voxelization family is scatter/gather-shaped — the worst fit for TPU's
vector/matrix units if expressed literally (XLA lowers them to serialized
scatters). These kernels re-shape the problem: a scatter-mean over r³ voxels
is (mask @ features) where mask[u, j] = [inds_j == voxel_u], built on the
fly per voxel tile and contracted on the MXU — never materialized in HBM.
Same trick for trilinear devoxelization (8 weighted corners per point) and
its transpose.

Replaces (semantics-equivalent, per `spherical_vox.cu` /
`spherical_trilinear_devox.cu` / `vox.cu` / `trilinear_devox.cu`):
undefined points carry index -1 which matches no voxel id, so they drop out
of sums and get zero interpolation — the CUDA kernels' `pos == -1` skips.

All kernels run in interpret mode off-TPU so the test suite stays hermetic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ------------------------------------------------------------------ #
# Scatter-mean: features [b, n, c], inds [b, n] -> grid [b, s, c], cnt [b, s]


def _scatter_kernel(inds_ref, feat_ref, out_ref, cnt_ref, *, tile: int):
    t = pl.program_id(1)
    inds = inds_ref[0, 0, :]                    # [n] int32
    feat = feat_ref[0, :, :]                    # [n, c]
    n = inds.shape[0]
    tile_ids = t * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, n), 0)
    mask = (tile_ids == inds[None, :]).astype(feat.dtype)   # [T, n]
    sums = jnp.dot(mask, feat, preferred_element_type=jnp.float32)  # MXU
    # Count in f32: a bf16 accumulator can only represent integers <= 256.
    cnt = jnp.sum(mask.astype(jnp.float32), axis=1)          # [T]
    inv = jnp.where(cnt > 0, 1.0 / jnp.maximum(cnt, 1.0), 0.0)
    out_ref[0, :, :] = sums * inv[:, None]
    cnt_ref[0, 0, :] = cnt


@functools.partial(jax.jit, static_argnames=("num_segments", "tile"))
def scatter_mean_pallas(features: Array, inds: Array, num_segments: int,
                        tile: int = 512) -> tuple[Array, Array]:
    """Deterministic scatter-mean on the MXU.

    features [b, n, c] f32, inds [b, n] int32 (negative = dropped) ->
    (out [b, num_segments, c], cnt [b, num_segments]).
    """
    b, n, c = features.shape
    assert num_segments % tile == 0, (num_segments, tile)
    grid = (b, num_segments // tile)
    # TPU block rule: last two dims of a block must be (8k, 128k) or span
    # the full array — index vectors ride along as [b, 1, n].
    out, cnt = pl.pallas_call(
        functools.partial(_scatter_kernel, tile=tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, num_segments, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, num_segments), jnp.float32),
        ],
        interpret=not _on_tpu(),
    )(inds[:, None, :], features)
    return out, cnt[:, 0, :]


# ------------------------------------------------------------------ #
# Weighted multi-corner gather (trilinear devoxelize forward):
# grid [b, s, c], corner_idx [b, n, 8], corner_w [b, n, 8] -> out [b, n, c]


def _gather_kernel(idx_ref, w_ref, grid_ref, out_ref, acc_ref, *, tile: int):
    t = pl.program_id(2)
    idx = idx_ref[0, :, :]                      # [8, np] (k on sublanes)
    w = w_ref[0, :, :]
    grid_tile = grid_ref[0, :, :]               # [T, c]
    n_pts = idx.shape[1]
    tile_ids = t * tile + jax.lax.broadcasted_iota(
        jnp.int32, (n_pts, tile), 1
    )  # [np, T]
    m = jnp.zeros((n_pts, tile), jnp.float32)
    for k in range(8):
        m = m + jnp.where(idx[k, :][:, None] == tile_ids, w[k, :][:, None], 0.0)
    partial_out = jnp.dot(m, grid_tile, preferred_element_type=jnp.float32)

    @pl.when(t == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(partial_out)

    acc_ref[:, :] += partial_out

    @pl.when(t == pl.num_programs(2) - 1)
    def _():
        out_ref[0, :, :] = acc_ref[:, :]


@functools.partial(jax.jit, static_argnames=("tile",))
def corner_gather_pallas(grid: Array, corner_idx: Array, corner_w: Array,
                         tile: int = 2048) -> Array:
    """out[p, c] = Σ_k w[p, k] * grid[idx[p, k], c]; negative idx skipped."""
    b, s, c = grid.shape
    n = corner_idx.shape[1]
    assert s % tile == 0
    idx_t = jnp.swapaxes(corner_idx, -1, -2)
    w_t = jnp.swapaxes(corner_w, -1, -2)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, tile=tile),
        grid=(b, 1, s // tile),
        in_specs=[
            pl.BlockSpec((1, 8, n), lambda bi, pi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n), lambda bi, pi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda bi, pi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda bi, pi, ti: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, c), jnp.float32)],
        interpret=not _on_tpu(),
    )(idx_t, w_t, grid)
    return out


def _scatter_w_kernel(idx_ref, w_ref, dout_ref, dgrid_ref, *, tile: int):
    t = pl.program_id(1)
    idx = idx_ref[0, :, :]                      # [8, n] (k on sublanes)
    w = w_ref[0, :, :]
    dout = dout_ref[0, :, :]                    # [n, c]
    n_pts = idx.shape[1]
    tile_ids = t * tile + jax.lax.broadcasted_iota(
        jnp.int32, (tile, n_pts), 0
    )  # [T, n]
    m = jnp.zeros((tile, n_pts), jnp.float32)
    for k in range(8):
        m = m + jnp.where(idx[k, :][None, :] == tile_ids, w[k, :][None, :], 0.0)
    dgrid_ref[0, :, :] = jnp.dot(m, dout, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_segments", "tile"))
def corner_scatter_pallas(dout: Array, corner_idx: Array, corner_w: Array,
                          num_segments: int, tile: int = 512) -> Array:
    """Transpose of corner_gather: dgrid[v, c] = Σ_{p,k: idx=v} w * dout[p, c].

    corner_idx/corner_w: [b, n, 8] (transposed internally to [b, 8, n] so
    the per-corner slice lands on the sublane axis — Mosaic cannot gather
    along an 8-wide lane axis)."""
    b, n, c = dout.shape
    assert num_segments % tile == 0
    idx_t = jnp.swapaxes(corner_idx, -1, -2)
    w_t = jnp.swapaxes(corner_w, -1, -2)
    return pl.pallas_call(
        functools.partial(_scatter_w_kernel, tile=tile),
        grid=(b, num_segments // tile),
        in_specs=[
            pl.BlockSpec((1, 8, n), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_segments, c), jnp.float32),
        interpret=not _on_tpu(),
    )(idx_t, w_t, dout)
