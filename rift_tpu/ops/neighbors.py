"""Neighbor search ops: KNN, ball query, grouping, 3-NN interpolation.

TPU-native equivalents of the reference CUDA ops:
- `knn` (`src/knn/knn.cu:5-78`): bilateral brute-force KNN. Here the [n, m]
  squared-distance matrix is built from matmuls (MXU) and reduced with
  `jax.lax.top_k` — no insertion sort, no `UNDEFINE_VALUE=10000` sentinel
  needed because shapes are static.
- `ball_query` (`src/ball_query/ball_query.cu:19-50`): fixed-radius search
  keeping the first-u neighbors in point-index order, excluding self
  (d² > 1e-5), padding with the first-found neighbor.
- `grouping` (`src/grouping/grouping.cu:18-85`): pure gather
  (`take_along_axis`); the scatter-add backward falls out of JAX AD.
- `three_nearest_neighbors_interpolate` (`src/interpolate/neighbor_interpolate.cu`):
  3-NN inverse-distance interpolation.

Layout: channels-last, points [..., n, 3], features [..., n, c].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST  # distance argmins are precision-sensitive


def pairwise_sqdist(a: Array, b: Array) -> Array:
    """Squared euclidean distances [..., n, m] between [..., n, c] and [..., m, c].

    Expressed as ‖a‖² + ‖b‖² - 2·a·bᵀ so the n×m contraction rides the MXU
    (ref semantics: `deepgmr_mn40.py:235` and `knn.cu:21-26`).
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    cross = jnp.einsum("...nc,...mc->...nm", a, b, precision=_HI)
    d = a2 + jnp.swapaxes(b2, -1, -2) - 2.0 * cross
    return jnp.maximum(d, 0.0)


def knn(queries: Array, points: Array, k: int) -> tuple[Array, Array]:
    """K nearest neighbors of each query among points.

    queries [..., n, c], points [..., m, c] ->
      (sq-distances [..., n, k] ascending, indices int32 [..., n, k]).
    """
    d = pairwise_sqdist(queries, points)
    m = points.shape[-2]
    k_eff = min(k, m)
    neg, idx = jax.lax.top_k(-d, k_eff)
    if k_eff < k:
        # Fewer points than requested neighbors: repeat the farthest
        # (CUDA reference pads with its UNDEFINE_VALUE sentinel; a repeated
        # real neighbor keeps downstream gathers well-defined).
        pad = k - k_eff
        neg = jnp.concatenate([neg] + [neg[..., -1:]] * pad, axis=-1)
        idx = jnp.concatenate([idx] + [idx[..., -1:]] * pad, axis=-1)
    return -neg, idx.astype(jnp.int32)


def bilateral_knn(xyz1: Array, xyz2: Array, k: int
                  ) -> tuple[Array, Array, Array, Array]:
    """KNN both ways (ref `F.k_nearest_neighbor` returning dist1/dist2/idx1/idx2)."""
    d1, i1 = knn(xyz1, xyz2, k)
    d2, i2 = knn(xyz2, xyz1, k)
    return d1, d2, i1, i2


def knn_select(xyz1: Array, xyz2: Array, k: int, bilateral: bool = True,
               return_distance: bool = True, return_index: bool = True):
    """Convenience combinations over bilateral KNN, returning *euclidean*
    distances (ref `PVCNN/modules/knn.py` knnModule:4-26)."""
    d1, d2, i1, i2 = bilateral_knn(xyz1, xyz2, k)
    d1, d2 = jnp.sqrt(d1), jnp.sqrt(d2)
    if return_distance and return_index:
        return (d1, d2, i1, i2) if bilateral else (d1, i1)
    if return_distance:
        return (d1, d2) if bilateral else d1
    if return_index:
        return (i1, i2) if bilateral else i1
    return None


def ball_query(centers: Array, points: Array, radius: float, num_neighbors: int
               ) -> Array:
    """Fixed-radius neighbor indices, reference-parity semantics.

    centers [..., m, 3], points [..., n, 3] -> int32 [..., m, u].

    Ref `ball_query.cu:19-50`: scan points in index order; keep the first u
    with d² < radius² and d² > 1e-5 (self-exclusion); pad the remaining slots
    with the first-found neighbor. If a center has no neighbor at all the
    reference leaves uninitialized memory; here such rows are filled with the
    index of the nearest point (well-defined, still deterministic).
    """
    u = num_neighbors
    n = points.shape[-2]
    d2 = pairwise_sqdist(centers, points)  # [..., m, n]
    valid = (d2 < radius * radius) & (d2 > 1e-5)
    # Rank by point index among valid: key = index where valid else n (big).
    arange = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(valid, arange, n)
    # u smallest keys = first u valid indices in scan order.
    u_eff = min(u, n)
    neg_key, order = jax.lax.top_k(-key, u_eff)
    first_u = -neg_key  # [..., m, u_eff]; == n where slot empty
    if u_eff < u:  # fewer points than neighbor slots: pad with empties
        empty = jnp.full(first_u.shape[:-1] + (u - u_eff,), n, first_u.dtype)
        first_u = jnp.concatenate([first_u, empty], axis=-1)
    has = first_u < n
    first_valid = first_u[..., :1]  # first-found neighbor (or n)
    padded = jnp.where(has, first_u, jnp.broadcast_to(first_valid, first_u.shape))
    # Centers with zero neighbors: fall back to the nearest point.
    nearest = jnp.argmin(d2, axis=-1).astype(jnp.int32)[..., None]
    any_valid = jnp.any(valid, axis=-1, keepdims=True)
    out = jnp.where(any_valid, padded, jnp.broadcast_to(nearest, padded.shape))
    del order
    return out.astype(jnp.int32)


def gather_rows_onehot(features: Array, flat_idx: Array) -> Array:
    """Row gather as a one-hot MXU contraction: out[i] = features[flat_idx[i]].

    features [..., n, c], flat_idx int [..., m] -> [..., m, c].

    TPU's native row gather serializes per index (≈27 ms for 4 M indices on
    one chip); selecting with a one-hot matrix turns it into a matmul the MXU
    streams at memory speed (≈8 ms exact / 3 ms bf16). HIGHEST precision makes
    it bit-exact for f32: the selector entries are exactly representable and
    each output row sums exactly one product.
    """
    n = features.shape[-2]
    onehot = jax.nn.one_hot(flat_idx, n, dtype=features.dtype)
    return jnp.einsum("...mn,...nc->...mc", onehot, features, precision=_HI)


def grouping(features: Array, indices: Array) -> Array:
    """Gather features by neighbor indices.

    features [..., n, c], indices int [..., m, u] -> [..., m, u, c].
    Ref: `grouping.cu:18-36` (backward = scatter-add, provided by AD).

    On TPU the gather runs as a one-hot MXU contraction (bit-exact, ~6x the
    throughput of XLA's row gather); other backends use take_along_axis.
    """
    c = features.shape[-1]
    m, u = indices.shape[-2], indices.shape[-1]
    flat_idx = indices.reshape(indices.shape[:-2] + (m * u,)).astype(jnp.int32)
    if jax.default_backend() == "tpu" and jnp.issubdtype(features.dtype, jnp.floating):
        gathered = gather_rows_onehot(features, flat_idx)
    else:
        gathered = jnp.take_along_axis(features, flat_idx[..., None], axis=-2)
    return gathered.reshape(indices.shape[:-2] + (m, u, c))


def ball_slot_select(d2: Array, radius: float, num_neighbors: int,
                     rank_impl: str = "cumsum"
                     ) -> tuple[Array, Array, Array]:
    """Shared first-u-in-index-order neighbor slot selection.

    One source of truth for the rank-select semantics used by
    `ball_query_group` and `ops.ppf.local_ppf_grouped_fast`: keep the first
    `num_neighbors` in-radius points per row in point-index order, with the
    nearest point as fallback for isolated rows. Returns
    (sel bool [..., m, n] — selected pairs, slot int32 [..., m, n] — slot
    index of each selected pair, cnt int32 [..., m] — in-radius count).

    rank_impl: 'cumsum' = exclusive prefix count via jnp.cumsum;
    'matmul' = ONE triangular bf16 matmul (0/1 products, f32 accumulation —
    exact, and ~19 ms cheaper than the log-depth cumsum over the 512 MB
    mask at flagship shapes on v5e; microbench2 localppf2).
    """
    u = num_neighbors
    n = d2.shape[-1]
    valid = (d2 < radius * radius) & (d2 > 1e-5)
    if rank_impl == "matmul":
        tri = jnp.tril(jnp.ones((n, n), jnp.bfloat16), -1)
        rank = jax.lax.dot_general(
            valid.astype(jnp.bfloat16), tri,
            (((valid.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
    else:
        vi = valid.astype(jnp.int32)
        rank = jnp.cumsum(vi, axis=-1) - vi
    keep = valid & (rank < u)
    cnt = jnp.sum(valid.astype(jnp.int32), axis=-1)
    nearest = jnp.argmin(d2, axis=-1)
    arange_n = jnp.arange(n, dtype=jnp.int32)
    fallback = (cnt == 0)[..., None] & (arange_n == nearest[..., None])
    sel = keep | fallback
    slot = jnp.where(keep, rank, 0)  # fallback rows land in slot 0
    return sel, slot, cnt


def ball_query_group(centers: Array, points: Array, features: Array,
                     radius: float, num_neighbors: int
                     ) -> tuple[Array, Array]:
    """Fused ball query + grouping without the top-k sort (rank-select).

    Same neighbor SET as `ball_query` followed by `grouping` — the first
    `num_neighbors` in-radius points in index order, nearest-point fallback
    for isolated centers — but selection is an exclusive-prefix rank
    (cumsum) and the gather is one slot-one-hot MXU contraction, skipping
    `lax.top_k`'s full sort (~44 ms at [128, 1024, 1024] on v5e; this path
    measures the sort away).

    Returns (grouped [..., m, u, c], slot_valid bool [..., m, u]). Padding
    differs from `ball_query` (zero rows instead of duplicated first
    neighbor) so consumers MUST mask with `slot_valid` before any reduction
    that is not duplicate-invariant. For max-pool consumers, masking with
    slot_valid gives results identical to the ball_query+grouping
    composition (duplicates never change a max; the fallback row is slot 0).

    Backend contract: the [..., m, u, n] boolean selector below is only
    legal because XLA fuses its producer into the dot (on TPU this is the
    point of the formulation — the MXU streams it; materialized it would be
    64 GiB at flagship shapes). On non-TPU backends the dense path is used
    only while the selector stays small; above ~2^27 elements it falls back
    to the ball_query+grouping composition with slot_valid masking, which
    yields identical outputs for mask-respecting consumers.
    """
    u = num_neighbors
    n = points.shape[-2]
    d2 = pairwise_sqdist(centers, points)  # [..., m, n]
    if jax.default_backend() != "tpu" and d2.size * u > 2**27:
        idx = ball_query(centers, points, radius, u)
        grouped = grouping(features, idx)
        count = jnp.sum((d2 < radius * radius) & (d2 > 1e-5), axis=-1)
        slot_valid = (jnp.arange(u, dtype=jnp.int32)
                      < jnp.maximum(count, 1)[..., None])
        return jnp.where(slot_valid[..., None], grouped, 0.0), slot_valid
    sel, slot, count = ball_slot_select(d2, radius, u)
    s_iota = jnp.arange(u, dtype=jnp.int32)
    # [..., m, u, n] selector; elementwise producer fuses into the dot so it
    # is never materialized in HBM (same property the one-hot gather relies
    # on — at [128, 1024, 128, 1024] materialization would be 64 GiB).
    m3 = (sel[..., None, :] & (slot[..., None, :] == s_iota[:, None])).astype(
        features.dtype)
    grouped = jnp.einsum("...mun,...nc->...muc", m3, features, precision=_HI)
    slot_valid = s_iota < jnp.maximum(count, 1)[..., None]
    return grouped, slot_valid


def ball_group(centers: Array, points: Array, features: Array | None,
               radius: float, num_neighbors: int,
               include_coordinates: bool = True) -> Array:
    """BallQuery module semantics (`PVCNN/modules/ball_query.py:16-35`):
    query + group + center-relative coordinates (+ optional feature concat).

    Returns [..., m, u, 3(+c)] — channels-last (reference is [b, c, u, m]).
    """
    idx = ball_query(centers, points, radius, num_neighbors)
    nbr = grouping(points, idx)  # [..., m, u, 3]
    rel = nbr - centers[..., None, :]
    if features is None:
        return rel if include_coordinates else nbr
    feat = grouping(features, idx)
    if include_coordinates:
        return jnp.concatenate([rel, feat], axis=-1)
    return feat


def three_nn_interpolate(target_coords: Array, source_coords: Array,
                         source_features: Array) -> Array:
    """Interpolate source features onto target points by inverse-distance
    weights of the 3 nearest sources.

    target [..., n, 3], source [..., m, 3], feats [..., m, c] -> [..., n, c].
    Ref: `neighbor_interpolate.cu:21-76` (weights 1/d normalized).
    """
    d2, idx = knn(target_coords, source_coords, 3)
    inv = 1.0 / jnp.maximum(d2, 1e-10)
    w = inv / jnp.sum(inv, axis=-1, keepdims=True)  # [..., n, 3]
    gathered = grouping(source_features, idx)  # [..., n, 3, c]
    return jnp.sum(w[..., None] * gathered, axis=-2)


def mutual_nearest_neighbors(feat1: Array, feat2: Array
                             ) -> tuple[Array, Array, Array]:
    """Cycle-consistent mutual nearest neighbors in feature space.

    feat1 [n1, c], feat2 [n2, c] ->
      (idx1 int32 [n1], idx2 int32 [n1], mask bool [n1]): for each point i of
    cloud 1, its NN j = idx2[i] in cloud 2; mask[i] = (NN of j is i).

    Ref: `deepgmr_mn40.py:232-244` find_correspondence_one_pair — identical
    semantics, but returned as fixed-shape masked arrays (jittable) instead
    of dynamically-sized index lists.
    """
    d = pairwise_sqdist(feat1, feat2)
    corr12 = jnp.argmin(d, axis=-1)  # [n1]
    corr21 = jnp.argmin(d, axis=-2)  # [n2]
    n1 = feat1.shape[-2]
    arange = jnp.arange(n1, dtype=corr12.dtype)
    mask = corr21[corr12] == arange
    return arange.astype(jnp.int32), corr12.astype(jnp.int32), mask


def gated_mutual_nearest_neighbors(feat1: Array, feat2: Array,
                                   spatial_valid: Array
                                   ) -> tuple[Array, Array, Array]:
    """Mutual-NN restricted to spatially plausible candidate pairs.

    Same contract as `mutual_nearest_neighbors`, but candidates with
    `spatial_valid[i, j] == False` are excluded from both argmins. Used by
    the sequence pipeline with a motion-prior gate (a scan of a repetitive
    scene — walls, floors — has near-identical features along a surface, so
    unconstrained feature argmin matches any wall point to any other; a
    prior-centered spatial gate turns that ambiguity back into a local
    correspondence problem). Points whose candidate set is empty come back
    masked out.
    """
    big = jnp.asarray(jnp.finfo(feat1.dtype).max, feat1.dtype)
    d = jnp.where(spatial_valid, pairwise_sqdist(feat1, feat2), big)
    corr12 = jnp.argmin(d, axis=-1)
    corr21 = jnp.argmin(d, axis=-2)
    n1 = feat1.shape[-2]
    arange = jnp.arange(n1, dtype=corr12.dtype)
    has = jnp.take_along_axis(spatial_valid, corr12[..., None], axis=-1)[..., 0]
    mask = (corr21[corr12] == arange) & has
    return arange.astype(jnp.int32), corr12.astype(jnp.int32), mask
