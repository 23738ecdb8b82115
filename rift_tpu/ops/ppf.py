"""Point-Pair Features (PPF), rotation-invariant 4-d descriptors.

TPU-native formulation of the reference CUDA op `spherical_ppf`
(`PVCNN/modules/functional/src/spherical_ppf/ppf.cu:19-91`) and the torch
local-PPF block (`PVCNN/models/pvcnn_classify.py:252-271`).

Layout convention: channels-last. Points are [..., n, 3].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST

_NORMAL_EPS = 1e-10


def _safe_unit(v: Array, eps: float) -> tuple[Array, Array]:
    """Returns (unit vector, norm). Zero vectors stay zero."""
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    unit = v / jnp.maximum(norm, eps)
    return unit, norm[..., 0]


def ppf(coords: Array, centers: Array, normals: Array, center_normals: Array) -> Array:
    """Pairwise PPF of each point vs its paired center.

    Matches `ppf.cu` semantics: d = center - point; features are
    (∠(d̂, n_center), ∠(d̂, n_point), ∠(n_center, n_point), ‖d‖).
    A point whose normal (or whose center's normal) has norm <= 1e-10 is
    "undefined" and yields an all-zero feature (`ppf.cu:60-69`).

    Args:
      coords:          [..., n, 3] point coordinates.
      centers:         [..., n, 3] paired center coordinates (broadcastable).
      normals:         [..., n, 3] point normals (not necessarily unit).
      center_normals:  [..., n, 3] center normals.

    Returns:
      [..., n, 4] PPF features.
    """
    d = centers - coords
    d_norm = jnp.linalg.norm(d, axis=-1)
    d_unit = d / jnp.maximum(d_norm[..., None], 1e-20)

    n1, n1_norm = _safe_unit(center_normals, _NORMAL_EPS)
    n2, n2_norm = _safe_unit(normals, _NORMAL_EPS)

    def angle(a, b):
        return jnp.arccos(jnp.clip(jnp.sum(a * b, axis=-1), -1.0, 1.0))

    feat = jnp.stack(
        [angle(d_unit, n1), angle(d_unit, n2), angle(n1, n2), d_norm], axis=-1
    )
    defined = (n1_norm > _NORMAL_EPS) & (n2_norm > _NORMAL_EPS)
    return jnp.where(defined[..., None], feat, 0.0)


def global_ppf(coords: Array, normals: Array) -> Array:
    """Global PPF of every point vs the cloud centroid
    (ref: pvcnn_classify.py:99-117 'ppf' preprocess).

    coords/normals: [..., n, 3]. Normals are unit-normalized first
    (pvcnn_classify.py:101). Returns [..., n, 4].
    """
    normals = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12
    )
    centers = jnp.mean(coords, axis=-2, keepdims=True)
    center_normals = jnp.mean(normals, axis=-2, keepdims=True)
    n = coords.shape[-2]
    centers = jnp.broadcast_to(centers, coords.shape)
    center_normals = jnp.broadcast_to(center_normals, normals.shape)
    del n
    return ppf(coords, centers, normals, center_normals)


def local_ppf(neighbor_coords: Array, neighbor_normals: Array,
              center_coords: Array, center_normals: Array) -> Array:
    """Per-neighborhood PPF (ref: pvcnn_classify.py:252-269).

    Args:
      neighbor_coords:  [..., n, k, 3] grouped neighbor coordinates.
      neighbor_normals: [..., n, k, 3].
      center_coords:    [..., n, 3] query centers.
      center_normals:   [..., n, 3].

    Returns [..., n, k, 4]: (∠(n_nbr,d̂), ∠(n_ctr,d̂), ∠(n_nbr,n_ctr), ‖d‖)
    with d = center - neighbor, exactly the reference's channel order
    (nr_d, ni_d, nr_ni, d_norm).
    """
    d = center_coords[..., None, :] - neighbor_coords  # [..., n, k, 3]
    d_norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    d_unit = d / jnp.maximum(d_norm, 1e-20)
    nc = center_normals[..., None, :]

    def angle(a, b):
        return jnp.arccos(jnp.clip(jnp.sum(a * b, axis=-1), -1.0, 1.0))

    return jnp.stack(
        [
            angle(neighbor_normals, d_unit),
            angle(jnp.broadcast_to(nc, d_unit.shape), d_unit),
            angle(neighbor_normals, jnp.broadcast_to(nc, neighbor_normals.shape)),
            d_norm[..., 0],
        ],
        axis=-1,
    )


def local_ppf_grouped_fast(coords: Array, normals: Array, radius: float,
                           num_neighbors: int) -> tuple[Array, Array]:
    """Fused eval-path local-PPF neighborhood features, bf16.

    Produces the same (neighbor set, slot order, PPF channels) as
    `ball_query_group(coords, coords, concat(coords, normals)) -> local_ppf
    -> bf16 cast` (the shipped eval composition in models/pvcnn.py), but:

    - the exclusive-prefix neighbor rank comes from ONE triangular bf16
      matmul (0/1 products, f32 accumulation — exact; verified equal to the
      cumsum at flagship shapes) instead of a log-depth cumsum over the
      512 MB validity mask (~19 ms cheaper on v5e, microbench2 localppf2);
    - the per-pair PPF channels are built from [n, n] dot-product maps
      (n_a·p_b, n_a·n_b — two MXU matmuls) and gathered as 4 bf16 channels
      with the slot one-hot, instead of gathering 6 f32 coordinate/normal
      channels at HIGHEST precision (~3x cheaper contraction).

    Numerics: channel k of pair (i, j) is n·c_i − n·p_j instead of
    n·(c_i − p_j) — equal up to one f32 reassociation, then cast to bf16
    exactly as the consuming bf16 SharedMLP would cast its input; use only
    when the fuser MLP computes in bf16 (models/pvcnn.py gates on dtype).

    Returns (feats bf16 [..., n, k, 4], slot_valid bool [..., n, k]).
    """
    from .neighbors import ball_slot_select, pairwise_sqdist

    u = num_neighbors
    n = coords.shape[-2]
    d2 = pairwise_sqdist(coords, coords)
    sel, slot, cnt = ball_slot_select(d2, radius, u, rank_impl="matmul")
    arange_n = jnp.arange(n, dtype=jnp.int32)
    s_iota = jnp.arange(u, dtype=jnp.int32)

    # Dot-product maps: M[a, b] = n_a · p_b, NN[a, b] = n_a · n_b.
    m = jnp.einsum("...ac,...bc->...ab", normals, coords, precision=_HI)
    diag_m = jnp.sum(normals * coords, axis=-1)  # n_a · p_a
    nn = jnp.einsum("...ac,...bc->...ab", normals, normals, precision=_HI)
    dn = jnp.sqrt(jnp.maximum(d2, 0.0))
    inv = 1.0 / jnp.maximum(dn, 1e-20)
    # pair (i=center, j=neighbor), d_ij = c_i - p_j:
    ch0 = jnp.swapaxes(m, -1, -2) - diag_m[..., None, :]   # n_j · d_ij
    ch1 = diag_m[..., :, None] - m                         # n_i · d_ij
    # Self pairs (the cnt==0 nearest fallback selects i itself): the
    # gathered form computes d = c_i − p_i = exact 0 → d̂ = 0 → angles π/2
    # and distance 0; the map form's fp residue (≈1e−7) times 1/dn would
    # explode instead, so pin the diagonal to the gathered semantics.
    self_pair = arange_n[:, None] == arange_n[None, :]
    ch0 = jnp.where(self_pair, 0.0, ch0 * inv)
    ch1 = jnp.where(self_pair, 0.0, ch1 * inv)
    dn = jnp.where(self_pair, 0.0, dn)
    ang = lambda x: jnp.arccos(jnp.clip(x, -1.0, 1.0))  # noqa: E731
    feats = jnp.stack(
        [ang(ch0), ang(ch1), ang(nn), dn], axis=-1
    ).astype(jnp.bfloat16)                                  # [..., i, j, 4]

    m3 = (sel[..., None, :] & (slot[..., None, :] == s_iota[:, None])
          ).astype(jnp.bfloat16)                            # [..., i, u, j]
    grouped = jnp.einsum("...iuj,...ijc->...iuc", m3, feats,
                         preferred_element_type=jnp.float32)
    slot_valid = s_iota < jnp.maximum(cnt, 1)[..., None]
    return grouped.astype(jnp.bfloat16), slot_valid


def new_ppf(coords: Array, normals: Array) -> Array:
    """'new_ppf' preprocess: global PPF + median pairwise azimuth angle α
    (ref: pvcnn_classify.py:121-149). Returns [..., n, 5].

    The O(n²) pairwise angle matrix is expressed as matmuls so XLA maps it
    to the MXU; the median is a sort along the last axis.
    """
    normals = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12
    )
    centers = jnp.mean(coords, axis=-2, keepdims=True)  # [..., 1, 3]
    center_normals = jnp.mean(normals, axis=-2, keepdims=True)
    ncn = center_normals / jnp.maximum(
        jnp.linalg.norm(center_normals, axis=-1, keepdims=True), 1e-12
    )
    old = ppf(
        coords,
        jnp.broadcast_to(centers, coords.shape),
        normals,
        jnp.broadcast_to(center_normals, normals.shape),
    )  # [..., n, 4]

    norm_coords = coords - centers
    # Project onto the plane ⊥ center normal. NOTE (ref parity): the reference
    # multiplies the (coords·n̂) scalar by the *unnormalized* mean normal
    # (pvcnn_classify.py:130); reproduced here.
    proj = norm_coords - jnp.sum(norm_coords * ncn, axis=-1, keepdims=True) * center_normals
    cos_alpha = jnp.einsum("...ic,...jc->...ij", proj, proj, precision=_HI)
    cross = jnp.cross(proj[..., :, None, :], proj[..., None, :, :])
    sin_alpha = jnp.linalg.norm(cross, axis=-1)
    atan_alpha = jnp.arctan2(sin_alpha, cos_alpha)
    atan_alpha = jnp.where(atan_alpha <= 1e-5, 100.0, atan_alpha)
    alpha = jnp.median(atan_alpha, axis=-1)  # [..., n]
    return jnp.concatenate([old, alpha[..., None]], axis=-1)
