"""f32-faithful matmul precision for geometry/solver code.

On TPU, JAX's DEFAULT matmul precision feeds bf16 into the MXU. That is the
right trade for the learned feature stacks (explicitly cast to bf16 where
intended), but it silently degrades *pose math*: plain `a @ b` / einsum
products of 3x3 rotations accumulate ~4e-3 non-orthogonality per
composition. Measured on the round-4 map battery: edge rotations with
RᵀR−I up to 5e-3 and det up to 1.006, which made chained odometry drift
5-11° per step while each edge measured ~1° (the transpose-as-inverse step
metric amplifies non-orthogonality with chain length). CPU defaults to f32,
which is why none of this reproduced off-device.

`f32_geometry` wraps a solver entry point so everything traced inside runs
at HIGHEST precision; apply it to robust estimators, ICP, pose graph, BA,
and correspondence-refresh paths — never to the feature forward.
"""
from __future__ import annotations

import functools

import jax


def f32_geometry(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
