"""Data layer (SURVEY.md §2.6): classification + registration pipelines,
host-side numpy transforms, procedural synthetic fallback."""
from .modelnet40 import ModelNet40, ModelNet40Config, get_datasets  # noqa: F401
from .registration_pairs import (  # noqa: F401
    H5TestPairs,
    PairBatch,
    SyntheticPairs,
    get_pairs,
)
from . import synthetic, transforms  # noqa: F401
