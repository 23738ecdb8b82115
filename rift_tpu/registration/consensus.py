"""Flip-hypothesis consensus matching.

The canonical-frame preprocess ('change_coords') carries a discrete gauge
ambiguity: a sign-ambiguous orthogonal frame admits exactly four
right-handed sign assignments (ops/lrf.py:lrf_flip_hypotheses), and on
near-symmetric instances two independently canonicalized clouds can land
in different ones — measured as the dominant catastrophic-failure mode of
feature matching (pure ~180° frame flips; see pca_lrf docstring). The
reference has the same ambiguity and simply eats the failures.

Resolution, TPU-style: extract source features under all four hypotheses
(one batched forward), match each against the target's features, and score
every hypothesis by *rigidity consistency* — the number of match pairs
whose within-cloud distances agree (‖p_i−p_k‖ ≈ ‖q_j−q_l‖, the invariant
any rigid transform preserves; the same principle as TEASER's compatibility
graph). All-pairs scoring is one [n, n] elementwise pass per hypothesis —
matmul-shaped, trivially batched/vmapped.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.neighbors import (gated_mutual_nearest_neighbors,
                             mutual_nearest_neighbors, pairwise_sqdist)

Array = jax.Array


def rigidity_score(src: Array, dst: Array, i1: Array, i2: Array,
                   mask: Array, tau: float) -> Array:
    """Number of rigidity-consistent match pairs.

    src [n, 3], dst [m, 3], matches (i1, i2, mask) as returned by
    `mutual_nearest_neighbors` -> scalar count of (a, b) match pairs with
    |‖p_a − p_b‖ − ‖q_a − q_b‖| < tau.
    """
    p = src[i1]
    q = dst[i2]
    dp = jnp.sqrt(pairwise_sqdist(p, p))
    dq = jnp.sqrt(pairwise_sqdist(q, q))
    ok = (jnp.abs(dp - dq) < tau) & mask[:, None] & mask[None, :]
    return jnp.sum(ok)


def consensus_match(src: Array, dst: Array, feat_src_h: Array,
                    feat_dst: Array, tau: float = 0.04,
                    spatial_valid: Array | None = None
                    ) -> tuple[Array, Array, Array, Array]:
    """Match under every source-frame hypothesis, keep the most rigid one.

    src [n, 3], dst [m, 3], feat_src_h [H, n, c] (source features under H
    frame hypotheses), feat_dst [m, c] ->
    (i1 [n], i2 [n], mask [n], chosen_h scalar int).

    `spatial_valid` [n, m] (optional) restricts every hypothesis's matching
    to spatially plausible candidates (motion-prior gate, see
    `gated_mutual_nearest_neighbors`).
    """
    def match(fs):
        if spatial_valid is not None:
            return gated_mutual_nearest_neighbors(fs, feat_dst, spatial_valid)
        return mutual_nearest_neighbors(fs, feat_dst)

    i1s, i2s, masks = jax.vmap(match)(feat_src_h)
    scores = jax.vmap(
        lambda i1, i2, m: rigidity_score(src, dst, i1, i2, m, tau)
    )(i1s, i2s, masks)
    h = jnp.argmax(scores)
    return i1s[h], i2s[h], masks[h], h
