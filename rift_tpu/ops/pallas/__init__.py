"""Pallas TPU kernel layer (SURVEY.md §2.4 native-op equivalents)."""
from .onehot_ops import (  # noqa: F401
    corner_gather_pallas,
    corner_scatter_pallas,
    scatter_mean_pallas,
)
from .spherical_fast import (  # noqa: F401
    spherical_avg_voxelize_fast,
    spherical_trilinear_devoxelize_fast,
)
