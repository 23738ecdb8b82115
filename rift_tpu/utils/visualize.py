"""Headless visualization tools: PLY export for clouds, keypoints and
correspondences.

Capability parity with `o3d_tools/visualize_tools.py` (colored clouds,
keypoint markers, correspondence line sets) without an Open3D/GUI
dependency: artifacts are ASCII PLY files viewable in any point-cloud
viewer (MeshLab, CloudCompare, Open3D elsewhere).
"""
from __future__ import annotations

import numpy as np

FRAG1_COLOR = (227, 26, 28)    # red (source)
FRAG2_COLOR = (31, 120, 180)   # blue (target)
KEYPOINT_COLOR = (51, 160, 44)
LINE_COLOR = (255, 127, 0)


def save_pcd_ply(path: str, points: np.ndarray,
                 color: tuple[int, int, int] = FRAG1_COLOR,
                 colors: np.ndarray | None = None) -> None:
    """Write [n, 3] points as ASCII PLY (uniform or per-point uint8 colors)."""
    points = np.asarray(points, np.float32).reshape(-1, 3)
    if colors is None:
        colors = np.tile(np.asarray(color, np.uint8), (len(points), 1))
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(points)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for p, c in zip(points, colors):
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]} {c[1]} {c[2]}\n")


def save_registration_ply(path: str, source: np.ndarray, target: np.ndarray,
                          transform: np.ndarray | None = None) -> None:
    """Source (optionally transformed) + target in one colored PLY."""
    source = np.asarray(source, np.float32)
    if transform is not None:
        source = source @ np.asarray(transform)[:3, :3].T + np.asarray(transform)[:3, 3]
    pts = np.concatenate([source, np.asarray(target, np.float32)])
    colors = np.concatenate([
        np.tile(np.asarray(FRAG1_COLOR, np.uint8), (len(source), 1)),
        np.tile(np.asarray(FRAG2_COLOR, np.uint8), (len(target), 1)),
    ])
    save_pcd_ply(path, pts, colors=colors)


def save_correspondences_ply(path: str, source: np.ndarray, target: np.ndarray,
                             idx1: np.ndarray, idx2: np.ndarray,
                             mask: np.ndarray | None = None) -> None:
    """Correspondence line set as a PLY with edges
    (ref: visualize_correspondences)."""
    source = np.asarray(source, np.float32)
    target = np.asarray(target, np.float32)
    idx1 = np.asarray(idx1)
    idx2 = np.asarray(idx2)
    if mask is not None:
        keep = np.asarray(mask).astype(bool)
        idx1, idx2 = idx1[keep], idx2[keep]
    a = source[idx1]
    b = target[idx2]
    verts = np.concatenate([a, b])
    e = len(a)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element edge {e}\n")
        f.write("property int vertex1\nproperty int vertex2\n")
        f.write("end_header\n")
        for p in verts:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for i in range(e):
            f.write(f"{i} {i + e}\n")
