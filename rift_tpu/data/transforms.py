"""Host-side (numpy) data transforms: random SE(3), jitter, crops, sampling.

Parity targets:
- `utils/open3d_func.py:85-102` random_rotation (axis & translation drawn
  from U[0,1)³ then normalized — faithfully reproduced, including its
  non-uniformity over SO(3));
- `datasets/deepgmr_partial.py:139-167` 2.5-D z-buffer projection crop
  (min-z point per 2-D grid cell; the reference's `id is not -1` bug that
  keeps the -1 sentinel rows is NOT replicated);
- clipped Gaussian noise (`deepgmr_partial.py:98-106`);
- RPM-Net-style half-space crop via a uniform 2-sphere direction
  (`datasets/mn40_hdf.py` transforms + `datasets/math/random.py:5-30`);
- `utils/random_choice.py:2-7` randchoice.
"""
from __future__ import annotations

import numpy as np


def random_rotation(points: np.ndarray, normals: np.ndarray | None = None,
                    max_degree: float = 360.0, max_amp: float = 3.0,
                    rs: np.random.RandomState | None = None):
    """Random SE(3) applied to [n, 3] points (+normals). Returns
    (T [4,4], points', normals'?)."""
    rs = rs or np.random.RandomState(0)
    x = rs.rand(6)
    degree = rs.rand(1)[0] * max_degree * np.pi / 180.0
    amp = rs.rand(1)[0] * max_amp
    w, v = x[:3], x[3:]
    w = w / max(np.linalg.norm(w), 1e-12) * degree
    v = v / max(np.linalg.norm(v), 1e-12) * amp
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        rot = np.eye(3)
    else:
        k = w / theta
        kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        rot = np.eye(3) + np.sin(theta) * kx + (1 - np.cos(theta)) * kx @ kx
    t = np.eye(4, dtype=np.float64)
    t[:3, :3] = rot
    t[:3, 3] = v
    out_pts = (points @ rot.T + v).astype(np.float32)
    if normals is not None:
        return t, out_pts, (normals @ rot.T).astype(np.float32)
    return t, out_pts


def randchoice(rs: np.random.RandomState, n: int, num_samples: int) -> np.ndarray:
    """Without replacement when possible (ref: utils/random_choice.py:2-7)."""
    return rs.choice(n, num_samples, replace=n < num_samples)


def zbuffer_crop(pcd: np.ndarray, grid_num: int = 200) -> np.ndarray:
    """2.5-D visibility crop: keep the min-z point of each occupied xy cell
    (ref: deepgmr_partial.py project()). pcd [n, >=3] -> [m, k] subset."""
    pts = pcd[:, :3]
    centered = pts - pts.mean(0, keepdims=True)
    lo = centered.min(0)
    hi = centered.max(0)
    bound = 2 * (centered - lo) / np.maximum(hi - lo, 1e-9)
    gxy = np.floor(bound[:, :2] / (2.0 / grid_num)).astype(np.int64)
    gid = gxy[:, 0] + gxy[:, 1] * grid_num
    order = np.argsort(bound[:, 2], kind="stable")  # nearest (min z) first
    _, first = np.unique(gid[order], return_index=True)
    keep = np.sort(order[first])
    return pcd[keep]


def half_space_crop(pcd: np.ndarray, p_keep: float,
                    rs: np.random.RandomState) -> np.ndarray:
    """RPM-Net crop: keep the p_keep fraction on one side of a random plane
    through the centroid (ref: mn40_hdf.py transforms)."""
    phi = rs.uniform(0, 2 * np.pi)
    cos_theta = rs.uniform(-1.0, 1.0)
    sin_theta = np.sqrt(max(1 - cos_theta**2, 0.0))
    direction = np.array([sin_theta * np.cos(phi), sin_theta * np.sin(phi), cos_theta])
    pts = pcd[:, :3] - pcd[:, :3].mean(0, keepdims=True)
    dist = pts @ direction
    thresh = np.percentile(dist, (1 - p_keep) * 100.0)
    return pcd[dist > thresh]


def jitter(pcd: np.ndarray, sigma: float = 0.01, clip: float | None = 0.05,
           rs: np.random.RandomState | None = None) -> np.ndarray:
    """Gaussian xyz noise, optionally clipped (ref: deepgmr_partial.py:98-106)."""
    rs = rs or np.random.RandomState(0)
    noise = sigma * rs.randn(pcd.shape[0], 3)
    if clip:
        noise = np.clip(noise, -clip, clip)
    out = pcd.copy()
    out[:, :3] = out[:, :3] + noise.astype(pcd.dtype)
    return out


def resample(pcd: np.ndarray, num_points: int,
             rs: np.random.RandomState) -> np.ndarray:
    return pcd[randchoice(rs, pcd.shape[0], num_points)]


def quantile_band_crop(pcd: np.ndarray, lo: float, hi: float,
                       direction: np.ndarray) -> np.ndarray:
    """Keep points whose projection onto `direction` lies in the
    [lo, hi] quantile band of this cloud — the controlled-overlap crop of
    the partialK sweep tier (two clouds cropped to bands of known
    intersection along a COMMON world direction have a deterministic
    mutual-overlap fraction, unlike independent random half-spaces whose
    overlap distribution is wide)."""
    pts = pcd[:, :3] - pcd[:, :3].mean(0, keepdims=True)
    dist = pts @ np.asarray(direction, pcd.dtype)
    lo_t = np.percentile(dist, max(lo, 0.0) * 100.0)
    hi_t = np.percentile(dist, min(hi, 1.0) * 100.0)
    keep = (dist >= lo_t) & (dist <= hi_t)
    if keep.sum() < 8:  # degenerate band: fall back to the whole cloud
        return pcd
    return pcd[keep]
