"""Neural module layer (flax): SharedMLP, SE3d, PVConv, PointNet++ set
abstraction/feature-propagation modules (SURVEY.md §2.3)."""
from .pointnet2 import (  # noqa: F401
    PointNetAModule,
    PointNetFPModule,
    PointNetSAModule,
)
from .pvconv import PVConv, SE3d  # noqa: F401
from .shared_mlp import SharedMLP  # noqa: F401
