"""Local Reference Frame (LRF) canonicalization — the 'change_coords'
rotation-invariant preprocess.

TPU-native, fully vectorized re-design of the reference's per-sample Python
loops:
- global LRF: `PVCNN/models/pvcnn_classify.py:153-211` (per-batch `for` loop
  walking a norm-sorted rank list until a non-collinear second point is
  found) — here a masked argmax over all candidates, vmapped over the batch;
- local per-neighborhood LRF: `pvcnn_classify.py:286-329` (a `while` loop
  over neighbor slots) — same masked formulation per neighborhood.

Semantics preserved: base_x = farthest point direction; base_y = the
highest-ranked point whose norm > 1e-5 and |cos(base_x, ·)| < 0.9.
Global variant orthogonalizes base_x against base_y (ref :175-177);
local variant orthogonalizes base_y against base_x (ref :316-320).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST  # 3-dim geometry contractions: negligible
# FLOPs, but default (fast) matmul precision rounds enough to break exact
# rotation invariance — force full fp32.

Array = jax.Array

_COLLINEAR = 0.9
_NORM_EPS = 1e-5


def _unit(v: Array, eps: float = 1e-12) -> Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def _pick_base_y(units: Array, norms: Array, base_x: Array) -> Array:
    """First point (in rank order) with norm > 1e-5 and |cos| < 0.9.

    units [..., n, 3] rank-sorted unit vectors, norms [..., n],
    base_x [..., 3] -> base_y [..., 3].
    Falls back to the last candidate if none qualifies (the reference would
    assert; a jittable kernel must stay total).
    """
    lam = jnp.sum(units * base_x[..., None, :], axis=-1)  # [..., n]
    ok = (norms > _NORM_EPS) & (jnp.abs(lam) < _COLLINEAR)
    n = units.shape[-2]
    first = jnp.argmax(ok, axis=-1)  # 0 if none ok — but ok[0] is False by
    # construction (|cos(base_x, base_x)| == 1), so 0 only when none qualify.
    any_ok = jnp.any(ok, axis=-1)
    j = jnp.where(any_ok, first, n - 1)
    return jnp.take_along_axis(units, j[..., None, None], axis=-2)[..., 0, :]


def global_lrf(coords: Array) -> Array:
    """Global LRF basis from a centered cloud.

    coords [..., n, 3] (centered) -> rotation [..., 3, 3] whose ROWS are
    (base_x, base_y, base_z); canonical coords = coords @ basis.T.

    Ref: pvcnn_classify.py:153-184. base_x is the farthest point direction;
    base_y the first non-collinear direction down the rank list; then
    base_x <- unit(base_x - base_y(base_x·base_y)), base_z = unit(x × y).
    """
    norms = jnp.linalg.norm(coords, axis=-1)  # [..., n]
    order = jnp.argsort(-norms, axis=-1, stable=True)
    sorted_pts = jnp.take_along_axis(coords, order[..., None], axis=-2)
    sorted_norms = jnp.take_along_axis(norms, order, axis=-1)
    units = sorted_pts / jnp.maximum(sorted_norms[..., None], 1e-20)

    base_x = units[..., 0, :]
    base_y = _pick_base_y(units, sorted_norms, base_x)
    # Gram-Schmidt: orthogonalize x against y (reference order, :175-177).
    base_x = base_x - base_y * jnp.sum(base_x * base_y, axis=-1, keepdims=True)
    base_x = _unit(base_x)
    base_z = _unit(jnp.cross(base_x, base_y))
    return jnp.stack([base_x, base_y, base_z], axis=-2)


def change_coords(coords: Array, basis: Array | None = None) -> Array:
    """Canonicalize a centered cloud into its global LRF.

    coords [..., n, 3] -> [..., n, 3] (ref: new_x/new_y/new_z rows,
    pvcnn_classify.py:181-184). Pass `basis` [..., 3, 3] to canonicalize
    into an externally chosen frame (e.g. a flip hypothesis from
    `lrf_flip_hypotheses`) instead of computing the reference LRF.
    """
    if basis is None:
        basis = global_lrf(coords)
    return jnp.einsum("...ij,...nj->...ni", basis, coords, precision=_HI)


def local_lrf(neighbor_coords: Array) -> Array:
    """Per-neighborhood LRF canonicalization.

    neighbor_coords [..., n, k, 3] (grouped neighbors per query point) ->
    canonical neighbor coords [..., n, k, 3].

    Ref: pvcnn_classify.py:286-329 — neighbors are centered by their own
    mean, rank-sorted by norm; base_x = farthest, base_y = first
    non-collinear; base_y is orthogonalized against base_x (NOT the global
    variant's order); coordinates are projected in the *unsorted* centered
    frame (ref uses norm_neighbor_coords at :324-326).
    """
    centered = neighbor_coords - jnp.mean(neighbor_coords, axis=-2, keepdims=True)
    norms = jnp.linalg.norm(centered, axis=-1)
    order = jnp.argsort(-norms, axis=-1, stable=True)
    sorted_pts = jnp.take_along_axis(centered, order[..., None], axis=-2)
    sorted_norms = jnp.take_along_axis(norms, order, axis=-1)
    units = sorted_pts / jnp.maximum(sorted_norms[..., None], 1e-20)

    base_x = units[..., 0, :]
    base_y = _pick_base_y(units, sorted_norms, base_x)
    base_y = base_y - base_x * jnp.sum(base_x * base_y, axis=-1, keepdims=True)
    base_y = _unit(base_y, 1e-10)
    base_z = _unit(jnp.cross(base_x, base_y))
    basis = jnp.stack([base_x, base_y, base_z], axis=-2)  # [..., n? , 3, 3]
    return jnp.einsum("...ij,...kj->...ki", basis, centered, precision=_HI)


def pca_lrf(coords: Array) -> Array:
    """Resample-stable global LRF: PCA axes + third-moment sign fixing.

    coords [..., n, 3] (centered) -> basis [..., 3, 3], rows = canonical
    axes; canonical coords = coords @ basis.T (same convention as
    `global_lrf`).

    Why this exists: the reference's LRF (`pvcnn_classify.py:153-211`,
    replicated by `global_lrf`) hangs the whole frame on TWO sample points
    (the farthest point and the first non-collinear runner-up), so two
    independent 1024-point resamplings of the same surface routinely
    disagree by tens of degrees — measured on the procedural corpus:
    median 5.6°/30%>30° (full clouds), 11.9°/35%>30° (z-buffer crops).
    PCA axes are O(1/√n)-stable moments of the whole cloud; with signs
    fixed by the third moment along each axis this drops to 2.4°/12% and
    3.9°/17%. The residual failures are pure sign flips on near-symmetric
    instances (measured: 12/12 failures diag-like, 0 axis swaps), which is
    exactly what `lrf_flip_hypotheses` + consensus matching resolve at
    eval time.

    Axes are ordered by descending eigenvalue; right-handedness is
    enforced by replacing the third axis with x × y.
    """
    centered = coords - jnp.mean(coords, axis=-2, keepdims=True)
    cov = jnp.einsum("...ni,...nj->...ij", centered, centered,
                     precision=_HI) / centered.shape[-2]
    _, vecs = jnp.linalg.eigh(cov)             # ascending eigenvalues
    vecs = vecs[..., ::-1]                     # columns, descending
    proj = jnp.einsum("...ni,...ij->...nj", centered, vecs, precision=_HI)
    m3 = jnp.mean(proj**3, axis=-2)            # [..., 3]
    sign = jnp.where(m3 >= 0, 1.0, -1.0)
    vecs = vecs * sign[..., None, :]
    vx, vy = vecs[..., :, 0], vecs[..., :, 1]
    vz = jnp.cross(vx, vy)
    return jnp.stack([vx, vy, vz], axis=-2)    # rows = axes


def lrf_flip_hypotheses(basis: Array) -> Array:
    """The 4 right-handed sign assignments of an LRF basis.

    basis [..., 3, 3] (rows = axes) -> [..., 4, 3, 3]. A proper rotation
    constrains the axis signs to an even number of flips, so the gauge
    group of a sign-ambiguous orthogonal frame is exactly these four:
    (+,+,+), (+,-,-), (-,+,-), (-,-,+). Trying all four on ONE side of a
    matching pair covers every relative flip between two independently
    canonicalized clouds.
    """
    flips = jnp.asarray([[1.0, 1.0, 1.0], [1.0, -1.0, -1.0],
                         [-1.0, 1.0, -1.0], [-1.0, -1.0, 1.0]],
                        basis.dtype)           # [4, 3]
    return basis[..., None, :, :] * flips[..., :, :, None]


def lrf_basis(coords: Array, kind: str = "reference") -> Array:
    """Dispatch: 'reference' -> `global_lrf` (parity with the reference's
    farthest-point construction), 'pca' -> `pca_lrf` (resample-stable)."""
    if kind == "reference":
        return global_lrf(coords)
    if kind == "pca":
        return pca_lrf(coords)
    raise ValueError(f"unknown lrf kind {kind!r}")


def pca_align(coords: Array) -> Array:
    """PCA canonicalization (ref: pvcnn_classify.py:212-233 'pca').

    coords [..., n, 3] -> aligned [..., n, 3] via SVD of the centered cloud:
    features = Uᵀ·s (reference computes torch.svd of the [3, n] matrix; here
    eigh of the 3×3 covariance gives the same left basis, descending order).
    """
    centered = coords - jnp.mean(coords, axis=-2, keepdims=True)
    cov = jnp.einsum("...ni,...nj->...ij", centered, centered, precision=_HI)
    _, vecs = jnp.linalg.eigh(cov)  # ascending eigenvalues
    basis = vecs[..., ::-1]  # descending, columns = principal axes
    return jnp.einsum("...ij,...ni->...nj", basis, centered, precision=_HI)
