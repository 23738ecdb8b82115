"""Model layer (SURVEY.md §2.2): classifier / feature extractor, part-seg,
PointNet baselines."""
from .pointnet import PointNet, PointNetClassifier  # noqa: F401
from .pvcnn import DEFAULT_BLOCKS, PVCNNClassifier  # noqa: F401
from .shapenet import ShapeNetPVCNN  # noqa: F401
