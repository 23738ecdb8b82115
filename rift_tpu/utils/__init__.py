"""Misc utilities: headless visualization (PLY export)."""
from .visualize import (  # noqa: F401
    save_correspondences_ply,
    save_pcd_ply,
    save_registration_ply,
)
