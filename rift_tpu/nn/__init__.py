"""Neural module layer (flax): SharedMLP, SE3d, PVConv (SURVEY.md §2.3)."""
from .pvconv import PVConv, SE3d  # noqa: F401
from .shared_mlp import SharedMLP  # noqa: F401
