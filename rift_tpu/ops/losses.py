"""Loss functions (ref: PVCNN/modules/functional/loss.py:7-17 kl_loss /
huber_loss, PVCNN/modules/loss.py KLLoss wrapper)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def kl_loss(x: Array, y: Array) -> Array:
    """KL(y ‖ softmax(x))-style loss matching torch's F.kl_div(log_softmax(x), y)
    mean reduction (ref loss.py kl_loss)."""
    logp = jax.nn.log_softmax(x, axis=-1)
    return jnp.mean(jnp.where(y > 0, y * (jnp.log(jnp.maximum(y, 1e-12)) - logp), 0.0))


def huber_loss(error: Array, delta: float = 1.0) -> Array:
    """Smooth-L1 / Huber on raw errors (ref loss.py huber_loss)."""
    abs_err = jnp.abs(error)
    quad = 0.5 * error * error
    lin = delta * (abs_err - 0.5 * delta)
    return jnp.mean(jnp.where(abs_err <= delta, quad, lin))


def chamfer_distance(a: Array, b: Array) -> Array:
    """Symmetric chamfer over [..., n, 3] / [..., m, 3]
    (ref: mn40_hdf.py RPM-Net metrics)."""
    from .neighbors import pairwise_sqdist

    d = pairwise_sqdist(a, b)
    return jnp.mean(jnp.min(d, axis=-1), axis=-1) + jnp.mean(jnp.min(d, axis=-2), axis=-1)
