"""ModelNet40 classification pipeline.

Parity target: `datasets/modelnet40.py` (txt loader, random/FPS sampling with
cached FPS indices, centroid normalization, optional random SO(3)+translation
per split). When `root` is None or missing, a deterministic procedural
dataset stands in (see data/synthetic.py) so the full training stack runs in
any environment.

Host-side numpy pipeline emitting fixed-shape [b, n, 3|6] float32 batches —
no torch DataLoader; batching is a seeded permutation + reshape, and the
accelerator never waits on per-item Python (normals ship precomputed).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from collections.abc import Iterator

import numpy as np

from . import synthetic
from .transforms import randchoice, random_rotation

SPLITS = ("train", "valid", "test")


@dataclass
class ModelNet40Config:
    root: str | None = None
    num_points: int = 1024
    with_normals: bool = True
    sample_method: str = "random"  # 'random' | 'fps' (ref: sample_method)
    random_rot: dict = field(
        default_factory=lambda: {"train": True, "valid": True, "test": True}
    )
    max_degree: float = 360.0
    max_amp: float = 3.0
    # synthetic fallback sizes
    synthetic_items: dict = field(
        default_factory=lambda: {"train": 512, "valid": 128, "test": 128}
    )


class ModelNet40:
    """One split of ModelNet40 (or its synthetic stand-in)."""

    def __init__(self, config: ModelNet40Config, split: str):
        assert split in SPLITS
        self.config = config
        self.split = split
        root = config.root
        if root and os.path.isdir(root):
            self._items = self._scan_real(root, split)
            self._synthetic = False
        else:
            n_items = config.synthetic_items[split]
            seed = {"train": 1, "valid": 2, "test": 3}[split]
            self._clouds, self._labels = synthetic.make_dataset(
                n_items, max(config.num_points, 2048), seed=seed,
                with_normals=True,
            )
            self._synthetic = True

    def _scan_real(self, root: str, split: str):
        """modelnet40_normal_resampled layout: {root}/{class}/{class}_XXXX.txt
        listed by modelnet40_{train,test}.txt (ref: datasets/modelnet40.py)."""
        split_file = "modelnet40_train.txt" if split == "train" else "modelnet40_test.txt"
        with open(os.path.join(root, "modelnet40_shape_names.txt")) as f:
            classes = [line.strip() for line in f if line.strip()]
        class_to_idx = {c: i for i, c in enumerate(classes)}
        with open(os.path.join(root, split_file)) as f:
            names = [line.strip() for line in f if line.strip()]
        if split == "valid":  # reference reuses test for valid
            pass
        items = []
        for name in names:
            cls = "_".join(name.split("_")[:-1])
            items.append((os.path.join(root, cls, name + ".txt"), class_to_idx[cls]))
        return items

    def __len__(self) -> int:
        return len(self._items) if not self._synthetic else len(self._labels)

    def get(self, index: int, rs: np.random.RandomState) -> tuple[np.ndarray, int]:
        cfg = self.config
        if self._synthetic:
            pcd = self._clouds[index]
            label = int(self._labels[index])
        else:
            path, label = self._items[index]
            pcd = np.loadtxt(path, delimiter=",").astype(np.float32)
        idx = randchoice(rs, pcd.shape[0], cfg.num_points)
        pcd = pcd[idx]
        pts = pcd[:, :3] - pcd[:, :3].mean(0, keepdims=True)
        normals = pcd[:, 3:6] if (cfg.with_normals and pcd.shape[1] >= 6) else None
        if cfg.random_rot.get(self.split, False):
            if normals is not None:
                _, pts, normals = random_rotation(
                    pts, normals, cfg.max_degree, cfg.max_amp, rs=rs
                )
            else:
                _, pts = random_rotation(pts, None, cfg.max_degree, cfg.max_amp, rs=rs)
        out = np.concatenate([pts, normals], -1) if normals is not None else pts
        return out.astype(np.float32), label

    def batches(self, batch_size: int, seed: int = 0, shuffle: bool = True,
                drop_last: bool = True) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Yield (clouds [b, n, c], labels [b]) with a seeded permutation."""
        rs = np.random.RandomState(seed)
        order = rs.permutation(len(self)) if shuffle else np.arange(len(self))
        stop = (len(order) // batch_size) * batch_size if drop_last else len(order)
        for start in range(0, stop, batch_size):
            chunk = order[start:start + batch_size]
            items = [self.get(int(i), rs) for i in chunk]
            clouds = np.stack([c for c, _ in items])
            labels = np.asarray([l for _, l in items], np.int32)
            yield clouds, labels


def get_datasets(config: ModelNet40Config) -> dict[str, ModelNet40]:
    return {split: ModelNet40(config, split) for split in SPLITS}
