"""ShapeNet part-segmentation pipeline.

Parity target: `datasets/shapenet.py` (txt part files with per-point labels,
one-hot shape id appended to the inputs, jitter, random rotation, per-shape
IoU meter — the meter lives in train/meters.py). Falls back to procedural
shapes with geometric part labels (octant-of-LRF parts) when no dataset root
exists, so the seg model trains end-to-end anywhere.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from collections.abc import Iterator

import numpy as np

from . import synthetic
from .transforms import jitter as jitter_fn
from .transforms import randchoice, random_rotation

NUM_SHAPES = 16
NUM_PART_CLASSES = 50


@dataclass
class ShapeNetConfig:
    root: str | None = None
    num_points: int = 2048
    with_normals: bool = True
    with_one_hot_shape_id: bool = True
    normalize: bool = True
    jitter: bool = True
    random_rot: dict = field(
        default_factory=lambda: {"train": True, "test": True}
    )
    synthetic_items: dict = field(
        default_factory=lambda: {"train": 128, "test": 32}
    )


def _synthetic_parts(pts: np.ndarray, shape_id: int) -> np.ndarray:
    """Geometric pseudo-parts: octant of the centered cloud, offset per
    shape so the 50-class label space is exercised."""
    signs = (pts[:, :3] > 0).astype(np.int32)
    octant = signs[:, 0] * 4 + signs[:, 1] * 2 + signs[:, 2]
    base = (shape_id * 3) % (NUM_PART_CLASSES - 8)
    return (base + octant % 8).astype(np.int32)


class ShapeNet:
    def __init__(self, config: ShapeNetConfig, split: str):
        assert split in ("train", "test")
        self.config = config
        self.split = split
        root = config.root
        if root and os.path.isdir(root):
            self._items = self._scan_real(root, split)
            self._synthetic = False
        else:
            self._synthetic = True
            n = config.synthetic_items[split]
            rs = np.random.RandomState(11 if split == "train" else 13)
            self._shape_ids = rs.randint(0, NUM_SHAPES, n)

    def _scan_real(self, root: str, split: str):
        """shapenetcore layout (ref: shapenet.py:24-50)."""
        with open(os.path.join(root, "synsetoffset2category.txt")) as f:
            dir_to_id = {}
            for i, line in enumerate(f):
                _, shape_dir = line.strip().split()
                dir_to_id[shape_dir] = i
        with open(os.path.join(root, "train_test_split",
                               f"shuffled_{split}_file_list.json")) as f:
            file_list = json.load(f)
        items = []
        for fp in file_list:
            _, shape_dir, filename = fp.split("/")
            path = os.path.join(root, shape_dir, filename + ".txt")
            if os.path.isfile(path) and os.path.getsize(path):
                items.append((path, dir_to_id[shape_dir]))
        return items

    def __len__(self) -> int:
        return len(self._shape_ids) if self._synthetic else len(self._items)

    def get(self, index: int, rs: np.random.RandomState):
        cfg = self.config
        if self._synthetic:
            shape_id = int(self._shape_ids[index])
            pcd = synthetic.make_cloud(shape_id, max(cfg.num_points, 2048),
                                       seed=index + 31)
            labels = _synthetic_parts(pcd, shape_id)
        else:
            path, shape_id = self._items[index]
            data = np.loadtxt(path).astype(np.float32)
            pcd = data[:, :6]
            labels = data[:, -1].astype(np.int32)
        idx = randchoice(rs, pcd.shape[0], cfg.num_points)
        pcd, labels = pcd[idx], labels[idx]
        pts = pcd[:, :3]
        if cfg.normalize:
            pts = pts - pts.mean(0, keepdims=True)
            pts = pts / (np.max(np.linalg.norm(pts, axis=1)) + 1e-9)
        normals = pcd[:, 3:6] if cfg.with_normals else None
        if cfg.random_rot.get(self.split, False):
            if normals is not None:
                _, pts, normals = random_rotation(pts, normals, rs=rs)
            else:
                _, pts = random_rotation(pts, rs=rs)
        feats = [pts]
        if normals is not None:
            feats.append(normals)
        out = np.concatenate(feats, -1)
        if cfg.jitter and self.split == "train":
            out = jitter_fn(out, sigma=0.01, clip=0.05, rs=rs)
        if cfg.with_one_hot_shape_id:
            one_hot = np.zeros((out.shape[0], NUM_SHAPES), np.float32)
            one_hot[:, shape_id % NUM_SHAPES] = 1.0
            out = np.concatenate([out, one_hot], -1)
        return out.astype(np.float32), labels

    def batches(self, batch_size: int, seed: int = 0, shuffle: bool = True,
                drop_last: bool = True) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        rs = np.random.RandomState(seed)
        order = rs.permutation(len(self)) if shuffle else np.arange(len(self))
        stop = (len(order) // batch_size) * batch_size if drop_last else len(order)
        for start in range(0, stop, batch_size):
            chunk = order[start:start + batch_size]
            items = [self.get(int(i), rs) for i in chunk]
            yield (np.stack([c for c, _ in items]),
                   np.stack([l for _, l in items]))


def get_shapenet(config: ShapeNetConfig) -> dict[str, ShapeNet]:
    return {split: ShapeNet(config, split) for split in ("train", "test")}
