"""RPM-Net-style ModelNet40 h5 registration pipeline.

TPU-native equivalent of `datasets/mn40_hdf.py` (SURVEY.md §2.6): the
`ModelNetHdf` loader over the standard `modelnet40_ply_hdf5_2048` shards
(h5 `data [m, 2048, 3|6]` / `label [m, 1]` / optional `normal`), plus the
RPM-Net transform chains producing (src, ref, gt_transform) pairs:

- 'clean'   — resample + random SE(3) on one side;
- 'jitter'  — clean + independent resampling + clipped Gaussian noise;
- 'crop'    — jitter + independent half-space crops (partial overlap).

The reference's chains live in `datasets/transforms.py` composed at
`mn40_hdf.py:68-139`; its per-metric meter (`mn40_hdf.py:274-478`) maps to
`registration.metrics.rpmnet_metrics` + `train.meters.MeterRPMNet`. The
reference's auto-download (`mn40_hdf.py:164-258`) is intentionally absent
(no-egress environments); missing data falls back to the procedural
synthetic set so the full pipeline stays runnable.
"""
from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from collections.abc import Iterator

import numpy as np

from . import synthetic
from .transforms import half_space_crop, jitter, randchoice, random_rotation


@dataclass
class Mn40HdfConfig:
    root: str | None = None          # dir containing *train*.h5 / *test*.h5
    num_points: int = 1024
    mode: str = "crop"               # 'clean' | 'jitter' | 'crop'
    partial_keep: float = 0.7        # RPM-Net default p_keep
    noise_sigma: float = 0.01
    noise_clip: float = 0.05
    max_degree: float = 45.0         # RPM-Net trains on mild rotations
    max_amp: float = 0.5
    synthetic_items: int = 128


class ModelNetHdf:
    """One split of the h5 set (or its synthetic stand-in)."""

    def __init__(self, config: Mn40HdfConfig, split: str = "test"):
        self.config = config
        root = config.root
        files = sorted(glob.glob(os.path.join(root, f"*{split}*.h5"))) \
            if root and os.path.isdir(root) else []
        if files:
            import h5py

            data, labels, normals = [], [], []
            for path in files:
                with h5py.File(path, "r") as f:
                    data.append(np.asarray(f["data"], np.float32))
                    labels.append(np.asarray(f["label"], np.int64).reshape(-1))
                    if "normal" in f:
                        normals.append(np.asarray(f["normal"], np.float32))
            pts = np.concatenate(data)
            if normals:
                pts = np.concatenate([pts, np.concatenate(normals)], axis=-1)
            self._clouds = pts
            self._labels = np.concatenate(labels)
        else:
            seed = 7 if split == "train" else 11
            self._clouds, self._labels = synthetic.make_dataset(
                config.synthetic_items, 2048, seed=seed, with_normals=True)
            self._clouds = np.asarray(self._clouds)

    def __len__(self) -> int:
        return len(self._labels)

    def get_pair(self, index: int, rs: np.random.RandomState):
        """One registration pair under the configured chain.

        Returns dict(points_src [n,3], points_ref [n,3], transform_gt [4,4],
        label). transform_gt maps src -> ref.
        """
        cfg = self.config
        cloud = self._clouds[index][:, :3]
        cloud = cloud - cloud.mean(0, keepdims=True)

        src = cloud
        ref = cloud
        if cfg.mode == "crop":
            src = half_space_crop(src, cfg.partial_keep, rs)
            ref = half_space_crop(ref, cfg.partial_keep, rs)
        src = src[randchoice(rs, src.shape[0], cfg.num_points)]
        ref = ref[randchoice(rs, ref.shape[0], cfg.num_points)]
        transform, ref = random_rotation(
            ref, None, cfg.max_degree, cfg.max_amp, rs=rs)
        if cfg.mode in ("jitter", "crop"):
            src = jitter(src, cfg.noise_sigma, cfg.noise_clip, rs)
            ref = jitter(ref, cfg.noise_sigma, cfg.noise_clip, rs)
        return {
            "points_src": src.astype(np.float32),
            "points_ref": ref.astype(np.float32),
            "transform_gt": transform.astype(np.float32),
            "label": int(self._labels[index]),
        }

    def pairs(self, seed: int = 0) -> Iterator[dict]:
        rs = np.random.RandomState(seed)
        for index in range(len(self)):
            yield self.get_pair(index, rs)
