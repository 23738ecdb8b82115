"""Data layer (SURVEY.md §2.6): classification + registration pipelines,
host-side numpy transforms, procedural synthetic fallback."""
from .modelnet40 import ModelNet40, ModelNet40Config, get_datasets  # noqa: F401
from .registration_pairs import (  # noqa: F401
    H5TestPairs,
    PairBatch,
    SyntheticPairs,
    get_pairs,
)
from .mn40_hdf import Mn40HdfConfig, ModelNetHdf  # noqa: F401
from .modelnet40_4class import ModelNet40FourClass, reflection_label  # noqa: F401
from . import synthetic, transforms  # noqa: F401
