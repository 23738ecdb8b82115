"""Procedural point-cloud shapes: a self-contained stand-in for
ModelNet40-style data.

The reference trains on `modelnet40_normal_resampled` text files
(`datasets/modelnet40.py`); that corpus is not redistributable with this
repo, so the data layer falls back to a deterministic procedural generator:
40 parametric surface families (spheres, superellipsoids, tori, cones,
capsules, ...) sampled with analytic normals. Every loader accepts either a
real dataset root or `root=None` -> synthetic.
"""
from __future__ import annotations

import numpy as np

NUM_CLASSES = 40


def _sphere(u, v, p):
    r = p[0]
    x = r * np.sin(v) * np.cos(u)
    y = r * np.sin(v) * np.sin(u)
    z = r * np.cos(v)
    pts = np.stack([x, y, z], -1)
    n = pts / np.maximum(np.linalg.norm(pts, axis=-1, keepdims=True), 1e-9)
    return pts, n


def _superellipsoid_pts(u, v, p):
    a, b, c, e1, e2 = p[:5]

    def f(w, m):
        return np.sign(w) * np.abs(w) ** m

    x = a * f(np.sin(v), e1) * f(np.cos(u), e2)
    y = b * f(np.sin(v), e1) * f(np.sin(u), e2)
    z = c * f(np.cos(v), e1)
    return np.stack([x, y, z], -1)


def _superellipsoid(u, v, p):
    pts = _superellipsoid_pts(u, v, p)
    # numeric normals via finite-difference tangents
    eps = 1e-3
    du = _superellipsoid_pts(u + eps, v, p) - pts
    dv = _superellipsoid_pts(u, v + eps, p) - pts
    n = np.cross(du, dv)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    return pts, n


def _torus(u, v, p):
    cr, tr = p[0], p[1] * 0.4
    x = (cr + tr * np.cos(v)) * np.cos(u)
    y = (cr + tr * np.cos(v)) * np.sin(u)
    z = tr * np.sin(v)
    pts = np.stack([x, y, z], -1)
    center = np.stack([cr * np.cos(u), cr * np.sin(u), np.zeros_like(u)], -1)
    n = pts - center
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    return pts, n


def _cone(u, v, p):
    h, r = p[0], p[1]
    t = (v / np.pi)  # 0..1 along height
    x = r * (1 - t) * np.cos(u)
    y = r * (1 - t) * np.sin(u)
    z = h * (t - 0.5)
    pts = np.stack([x, y, z], -1)
    slope = np.stack([np.cos(u), np.sin(u), np.full_like(u, r / h)], -1)
    n = slope / np.maximum(np.linalg.norm(slope, axis=-1, keepdims=True), 1e-9)
    return pts, n


def _capsule(u, v, p):
    r, h = p[0] * 0.5, p[1]
    z = np.where(v < np.pi / 2, h / 2 + r * np.cos(v),
                 np.where(v > np.pi / 2, -h / 2 + r * np.cos(v), 0.0))
    rad = r * np.sin(v)
    x = rad * np.cos(u)
    y = rad * np.sin(u)
    pts = np.stack([x, y, z], -1)
    axis_pt = np.stack([np.zeros_like(u), np.zeros_like(u),
                        np.clip(z, -h / 2, h / 2)], -1)
    n = pts - axis_pt
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    return pts, n


_FAMILIES = [_sphere, _superellipsoid, _torus, _cone, _capsule]


def class_params(label: int) -> np.ndarray:
    """Deterministic shape parameters for a pseudo-class id."""
    rs = np.random.RandomState(1000 + label)
    return rs.uniform(0.4, 1.0, size=5)


def class_structure(label: int) -> list[tuple[int, np.ndarray, float,
                                              np.ndarray, float]]:
    """Deterministic composite spec for a class: [(family, params, scale,
    offset, point_fraction)].

    Classes are ASYMMETRIC composites (a primary primitive plus 1-2 smaller
    primitives at off-center offsets) — like real ModelNet40 objects
    (airplanes, chairs), and unlike single superellipsoids/tori, they are
    not point-symmetric, so a global reference frame is well-defined. A
    symmetric corpus makes two-stage registration intrinsically ambiguous
    (every global-LRF method flips on resampled symmetric shapes)."""
    rs = np.random.RandomState(5000 + label)
    n_parts = 2 + (label % 2)
    fracs = ([0.6, 0.4] if n_parts == 2 else [0.5, 0.3, 0.2])
    scales = [1.0, 0.45, 0.3]
    specs = []
    for j in range(n_parts):
        fam = int(rs.randint(0, len(_FAMILIES)))
        params = rs.uniform(0.4, 1.0, 5)
        if j == 0:
            offset = np.zeros(3)
        else:
            offset = rs.uniform(-0.5, 0.5, 3)
            offset += np.sign(offset + 1e-9) * 0.35  # keep it off-center
        specs.append((fam, params, scales[j], offset, fracs[j]))
    return specs


def make_cloud(label: int, num_points: int, seed: int,
               with_normals: bool = True,
               instance_jitter: float = 0.12) -> np.ndarray:
    """One cloud of class `label`: [n, 6] (xyz + unit normal) or [n, 3].

    `instance_jitter` perturbs the class's composite spec per item (part
    parameters, scales, offsets, anisotropy) — real ModelNet40 classes
    contain distinct mesh instances, not resamplings of one surface, and
    without within-class variation the classification task saturates
    trivially. Jitter is deterministic in `seed`, small relative to the
    inter-class parameter spread (classes draw params from U(0.4, 1.0))."""
    rs = np.random.RandomState(seed)
    aniso = 0.5 + 0.5 * (class_params(label * 7 + 3)[:3])
    aniso = aniso * (1.0 + instance_jitter * rs.uniform(-1, 1, 3))
    specs = [
        (fam, params * (1.0 + instance_jitter * rs.uniform(-1, 1, 5)),
         scale * (1.0 + instance_jitter * rs.uniform(-1, 1)),
         offset + (instance_jitter * 0.5) * rs.uniform(-1, 1, 3)
         if j > 0 else offset,
         frac)
        for j, (fam, params, scale, offset, frac)
        in enumerate(class_structure(label))
    ]
    counts = [max(int(num_points * frac), 8) for *_, frac in specs]
    counts[0] += num_points - sum(counts)
    pts_parts, nrm_parts = [], []
    for (fam_idx, params, scale, offset, _), n_j in zip(specs, counts):
        fam = _FAMILIES[fam_idx % len(_FAMILIES)]
        u = rs.uniform(0, 2 * np.pi, n_j)
        v = rs.uniform(1e-3, np.pi - 1e-3, n_j)
        pts, n = fam(u, v, params)
        pts = pts * aniso * scale + offset
        n = n / aniso
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        pts_parts.append(pts)
        nrm_parts.append(n)
    pts = np.concatenate(pts_parts, 0)[:num_points]
    n = np.concatenate(nrm_parts, 0)[:num_points]
    pts = pts - pts.mean(0, keepdims=True)
    pts /= np.max(np.linalg.norm(pts, axis=-1)) + 1e-9
    out = np.concatenate([pts, n], axis=-1) if with_normals else pts
    return out.astype(np.float32)


def make_dataset(num_items: int, num_points: int, seed: int = 0,
                 with_normals: bool = True, instance_jitter: float = 0.12
                 ) -> tuple[np.ndarray, np.ndarray]:
    """(clouds [m, n, 3|6], labels [m]) deterministic synthetic dataset.

    `instance_jitter` scales the per-item spec perturbation (see
    `make_cloud`); the hard eval tier raises it toward the inter-class
    parameter spread so class distributions genuinely overlap."""
    rs = np.random.RandomState(seed)
    labels = rs.randint(0, NUM_CLASSES, num_items)
    clouds = np.stack([
        make_cloud(int(lbl), num_points, seed=seed * 100003 + i,
                   with_normals=with_normals,
                   instance_jitter=instance_jitter)
        for i, lbl in enumerate(labels)
    ])
    return clouds, labels.astype(np.int32)
