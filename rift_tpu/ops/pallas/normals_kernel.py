"""Pallas TPU kernel for hybrid-radius normal-estimation moments.

The XLA normals path (ops/normals.py) materializes the [n, n] distance
matrix in HBM and sorts it for the exact k-th neighbor distance — ~20 ms
at [128, 1024] on v5e for an op whose roofline bound is < 1 ms
(ROOFLINE_r04 stage 1: 3.4% SoL). This kernel fuses the whole
neighborhood pass over row tiles resident in VMEM:

  d² tile (one MXU matmul) → exact k-th smallest via bracketed counting →
  hybrid radius → neighbor mask → moment matmul (Σp, Σp⊗p, count).

The [n, n] matrix never touches HBM; per cloud the kernel reads the
points twice (tiled + full) and writes [n, 16] moments.

Exact-kth by counting: ~32 bisection steps shrink a bracket (lo, hi] with
count(d² ≤ lo) < k ≤ count(d² ≤ hi), then the k-th smallest *data value*
is min{d² ∈ (lo, hi]} — exact for any input, duplicates included (ties at
the k-th value are all inside the radius, identical to the top_k +
(1+1e-6) expansion rule of the XLA path). Cost per step is one VMEM
compare+reduce instead of an HBM sort pass.

Ref semantics: `utils/open3d_func.py:77-83` (Open3D hybrid KD-tree
search + plane fit) — same hybrid rule as ops/normals.estimate_normals,
whose docstring explains why the k-th must be exact (equivariance).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BISECT_STEPS = 32


def _moments_kernel(pts_tile_ref, pts_ref, rhs_ref, out_ref, *,
                    k: int, radius_sq: float, tile: int):
    # Layout: queries on LANES (d2 is [n, T]) so every per-query reduction
    # (bisection counts, bracket min, row max) runs over the SUBLANE axis —
    # plain vreg adds + a 3-step intra-vreg fold — instead of a 10-step
    # cross-lane tree over n=1024 lanes per bisection step (measured ~2×
    # on the whole kernel).
    p_t = pts_tile_ref[0]                    # [T, 3] f32
    p_a = pts_ref[0]                         # [n, 3] f32
    rhs = rhs_ref[0]                         # [n, 16] f32
    cross = jax.lax.dot_general(
        p_a, p_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [n, T]
    d2 = (jnp.sum(p_a * p_a, axis=1, keepdims=True)
          + jnp.sum(p_t * p_t, axis=1)[None, :] - 2.0 * cross)
    d2 = jnp.maximum(d2, 0.0)

    if k > 0:
        lo0 = jnp.zeros((tile,), jnp.float32)
        hi0 = jnp.max(d2, axis=0)

        def step(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            cnt = jnp.sum((d2 <= mid[None, :]).astype(jnp.float32), axis=0)
            pred = cnt >= k
            return jnp.where(pred, lo, mid), jnp.where(pred, mid, hi)

        lo, hi = jax.lax.fori_loop(0, _BISECT_STEPS, step, (lo0, hi0))
        in_bracket = (d2 > lo[None, :]) & (d2 <= hi[None, :])
        kth = jnp.min(jnp.where(in_bracket, d2, jnp.inf), axis=0)
        # Empty bracket (≥ k coincident points at distance 0): kth = 0,
        # falling back to the fixed radius — identical to the XLA path.
        kth = jnp.where(jnp.isfinite(kth), kth, 0.0)
        r2 = jnp.maximum(radius_sq, kth * (1.0 + 1e-6))
    else:
        r2 = jnp.full((tile,), radius_sq, jnp.float32)

    mask = (d2 < r2[None, :]).astype(jnp.float32)  # [n, T]
    out_ref[0] = jax.lax.dot_general(
        mask, rhs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [T, 16]


@functools.partial(jax.jit,
                   static_argnames=("k", "radius_sq", "tile", "interpret"))
def neighborhood_moments_pallas(points: Array, k: int, radius_sq: float,
                                tile: int = 256, interpret: bool = False
                                ) -> tuple[Array, Array, Array]:
    """Hybrid-radius neighborhood moments, fused in VMEM.

    points [b, n, 3] f32 -> (s1 [b, n, 3] = Σ_j p_j, s2 [b, n, 3, 3]
    = Σ_j p_j p_jᵀ, cnt [b, n]) over neighbors j with
    d²(i, j) < max(radius_sq, kth_i·(1+1e-6)).
    """
    b, n, _ = points.shape
    assert n % tile == 0, (n, tile)
    points = points.astype(jnp.float32)
    outer = (points[..., :, None] * points[..., None, :]).reshape(b, n, 9)
    rhs = jnp.concatenate(
        [points, outer, jnp.ones((b, n, 1), jnp.float32),
         jnp.zeros((b, n, 3), jnp.float32)], axis=-1)  # [b, n, 16]
    out = pl.pallas_call(
        functools.partial(_moments_kernel, k=k, radius_sq=radius_sq,
                          tile=tile),
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 3), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 16), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, 16), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, 16), jnp.float32),
        interpret=interpret,
    )(points, points, rhs)
    s1 = out[..., :3]
    s2 = out[..., 3:12].reshape(b, n, 3, 3)
    cnt = out[..., 12]
    return s1, s2, cnt
