"""Graduated non-convexity (GNC) robust pose solvers: TLS (TEASER-style) and
Geman-McClure (FGR-style).

TPU-native replacement for the reference's external C++ solvers:
- TEASER++ GNC-TLS invocation (`deepgmr_mn40.py:172-231`: cbar2=1,
  noise_bound=0.02, gnc_factor=1.4, <=100 iterations, cost threshold 1e-12);
- Open3D FastGlobalRegistration (`utils/open3d_func.py:52-61`).

Design: both are expressed as one `lax.scan` of
(weight update -> weighted Kabsch) over a graduated control parameter μ —
branchless, fixed iteration count, fully batched over pairs via vmap.
TEASER's max-clique pruning and TIM decoupling are not replicated; the
mutual-NN correspondences the reference feeds the solver are clean enough
that GNC-TLS alone reaches the same accuracy regime (validated against the
RRE/RTE targets in BASELINE.md).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .kabsch import weighted_kabsch
from ..ops.precision import f32_geometry

Array = jax.Array


def _residuals(transform: Array, src: Array, dst: Array) -> Array:
    rot = transform[..., :3, :3]
    t = transform[..., :3, 3]
    moved = jnp.einsum("...ij,...nj->...ni", rot, src) + t[..., None, :]
    return jnp.linalg.norm(moved - dst, axis=-1)


@f32_geometry
@partial(jax.jit, static_argnames=("max_iterations", "kind", "early_exit"))
def gnc_pose(
    src: Array,
    dst: Array,
    valid: Array,
    noise_bound: float = 0.02,
    gnc_factor: float = 1.4,
    max_iterations: int = 100,
    kind: str = "tls",
    early_exit: bool = True,
) -> tuple[Array, Array]:
    """GNC robust SE(3) estimation over putative correspondences.

    src/dst [n, 3], valid [n] bool. kind: 'tls' (TEASER GNC-TLS weights) or
    'gm' (Geman-McClure, FGR-style). Returns (transform [4,4], weights [n]).

    `early_exit` selects the fixed-point `lax.while_loop` for 'tls' (exits
    when the weight vector repeats); False forces the fixed-length
    `lax.scan` — same result, different schedule. Kept togglable because
    under vmap the while-loop runs to the slowest pair and the two compile
    to different TPU dispatch patterns (bench bisect, VERDICT r2 #4).
    """
    c2 = noise_bound * noise_bound
    w0 = valid.astype(src.dtype)
    t0 = weighted_kabsch(src, dst, w0)
    r2_max = jnp.max(jnp.where(valid, _residuals(t0, src, dst) ** 2, 0.0))
    # μ init per TEASER: small μ = very convex surrogate.
    mu0 = c2 / jnp.maximum(2.0 * r2_max - c2, 1e-12)
    mu0 = jnp.maximum(mu0, 1e-6)

    def weights(transform, mu):
        r2 = _residuals(transform, src, dst) ** 2
        if kind == "tls":
            # GNC-TLS weight update (Yang et al. 2020, eq. 14).
            th1 = (mu + 1.0) / mu * c2
            th2 = mu / (mu + 1.0) * c2
            w = jnp.where(
                r2 >= th1,
                0.0,
                jnp.where(
                    r2 <= th2,
                    1.0,
                    jnp.sqrt(c2 * mu * (mu + 1.0) / jnp.maximum(r2, 1e-20)) - mu,
                ),
            )
        elif kind == "gm":
            # Geman-McClure with graduated scale (FGR): w = (μc²/(μc²+r²))².
            w = (mu * c2 / (mu * c2 + r2)) ** 2
        else:
            raise ValueError(f"unknown GNC kind {kind!r}")
        return w * valid

    if kind == "tls" and early_exit:
        # TLS converges to a FIXED POINT long before max_iterations (the
        # reference always burns all 100 Kabsch solves per pair,
        # `deepgmr_mn40.py:207-216`): once the weight vector repeats between
        # consecutive iterations, every later iteration is bitwise identical
        # — equal weights give an equal Kabsch transform, hence equal
        # residuals, and the TLS inlier band (th2, th1) only shrinks with
        # growing μ, so weights at the band edges never re-enter. A repeat
        # with a point still inside the open band would need the
        # μ-dependent sqrt formula to return the same value under a new μ
        # (measure zero). lax.while_loop exits at that fixed point; under
        # vmap the loop runs until the slowest pair converges, still far
        # below 100.
        def cond(carry):
            _, _, _, it, done = carry
            return (it < max_iterations) & ~done

        def body(carry):
            transform, mu, w_prev, it, _ = carry
            w = weights(transform, mu)
            new_t = weighted_kabsch(src, dst, w)
            done = jnp.all(w == w_prev) & (it > 0)
            return (new_t, mu * gnc_factor, w, it + 1, done)

        transform, _, w_last, _, _ = jax.lax.while_loop(
            cond, body,
            (t0, mu0, w0, jnp.zeros((), jnp.int32), jnp.zeros((), bool)))
        return transform, w_last

    def step(carry, _):
        transform, mu = carry
        w = weights(transform, mu)
        new_t = weighted_kabsch(src, dst, w)
        if kind == "tls":
            new_mu = mu * gnc_factor       # TLS: μ grows, band tightens
        else:
            new_mu = jnp.maximum(mu / gnc_factor, 1.0)  # GM: scale anneals
        return (new_t, new_mu), w

    init_mu = mu0 if kind == "tls" else jnp.asarray(64.0, src.dtype)
    (transform, _), ws = jax.lax.scan(step, (t0, init_mu),
                                      None, length=max_iterations)
    return transform, ws[-1]


def fgr_pose(src: Array, dst: Array, valid: Array,
             noise_bound: float = 0.04, max_iterations: int = 64
             ) -> tuple[Array, Array]:
    """FGR-flavored alias (graduated Geman-McClure)."""
    return gnc_pose(src, dst, valid, noise_bound=noise_bound,
                    max_iterations=max_iterations, kind="gm")
