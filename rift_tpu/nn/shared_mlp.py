"""SharedMLP: per-point (1×1 conv) MLP stacks.

TPU-native equivalent of `PVCNN/modules/shared_mlp.py:6-36` — the reference's
Conv1d/Conv2d(kernel=1)+BN+ReLU stacks are Dense layers over the trailing
channel axis here (channels-last: XLA fuses them into single MXU matmuls over
the flattened point dim).
"""
from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp


class SharedMLP(nn.Module):
    """[Dense + BatchNorm + ReLU] per hidden width.

    Input [..., n, c] (any number of leading axes; BN reduces over all but
    the channel axis, matching BatchNorm1d/2d over (batch, points)).
    """

    features: Sequence[int]
    bn_eps: float = 1e-5
    dtype: jnp.dtype | None = None  # compute dtype (e.g. bf16); params stay f32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for width in self.features:
            x = nn.Dense(width, dtype=self.dtype)(x)
            x = nn.BatchNorm(
                use_running_average=not train, epsilon=self.bn_eps,
                dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        return x
