"""ModelNet40 classification pipeline.

Parity target: `datasets/modelnet40.py` (txt loader, random/FPS sampling with
cached FPS indices, centroid normalization, optional random SO(3)+translation
per split). When `root` is None or missing, a deterministic procedural
dataset stands in (see data/synthetic.py) so the full training stack runs in
any environment.

Production host pipeline (the reference uses 8 DataLoader workers,
`train.py:70-76`):
- txt items are parsed once and cached as `.npy` next to the source file
  (10k-line `np.loadtxt` per item per epoch would starve the accelerator);
- `sample_method='fps'` runs furthest-point sampling once per item and
  caches the index order (`{file}.fps{n}.npy`), like the reference's
  `_fps.npy` cache (`datasets/modelnet40.py:34-39`);
- `batches()` overlaps host work with device steps via a thread pool +
  bounded prefetch queue. Augmentation randomness is derived per
  (epoch-seed, item-position) so results are deterministic regardless of
  worker scheduling.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from collections.abc import Iterator
from concurrent.futures import ThreadPoolExecutor

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
    # host pipeline
    num_workers: int = 4           # item-loading threads (0 = serial)
    prefetch_batches: int = 4      # batches built ahead of the consumer
    cache_npy: bool = True         # one-time .npy cache next to txt files
    # synthetic fallback sizes
    synthetic_items: dict = field(
        default_factory=lambda: {"train": 512, "valid": 128, "test": 128}
    )
    # --- degradation knobs (the hard eval tier raises these so the
    # synthetic benchmark stops saturating at 1.0 and can rank variants;
    # all default to the training distribution) ---
    instance_jitter: float = 0.12  # per-item shape-spec perturbation
    noise_sigma: float = 0.0       # additive Gaussian on xyz, clipped at 3σ
    occlusion: float = 0.0         # fraction removed behind a random halfspace


def _fps_order(points: np.ndarray, num_samples: int) -> np.ndarray:
    """Host-side furthest-point-sample index order (numpy; one-time, cached).
    Same semantics as ops/sampling.furthest_point_sample with start_idx=0."""
    n = points.shape[0]
    m = min(num_samples, n)
    idx = np.zeros(m, np.int64)
    min_d2 = np.full(n, np.inf, points.dtype)
    last = 0
    for k in range(m):
        idx[k] = last
        d2 = np.sum((points - points[last]) ** 2, axis=-1)
        np.minimum(min_d2, d2, out=min_d2)
        last = int(np.argmax(min_d2))
    return idx


class ModelNet40:
    """One split of ModelNet40 (or its synthetic stand-in)."""

    def __init__(self, config: ModelNet40Config, split: str):
        assert split in SPLITS
        assert config.sample_method in ("random", "fps"), config.sample_method
        self.config = config
        self.split = split
        self._fps_cache: dict[int, np.ndarray] = {}
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
                instance_jitter=config.instance_jitter,
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

    def _load_raw(self, index: int) -> tuple[np.ndarray, int]:
        """Full-resolution cloud + label, through the .npy parse cache."""
        if self._synthetic:
            return self._clouds[index], int(self._labels[index])
        path, label = self._items[index]
        npy = path + ".npy"
        if self.config.cache_npy and os.path.isfile(npy):
            return np.load(npy, mmap_mode="r"), label
        pcd = np.loadtxt(path, delimiter=",").astype(np.float32)
        if self.config.cache_npy:
            # np.save appends '.npy' when missing, so keep the suffix on tmp
            tmp = npy[:-4] + f".tmp{os.getpid()}.npy"
            np.save(tmp, pcd)
            os.replace(tmp, npy)  # atomic vs concurrent workers
        return pcd, label

    def _sample_indices(self, index: int, n_avail: int,
                        rs: np.random.RandomState) -> np.ndarray:
        cfg = self.config
        if cfg.sample_method == "fps":
            order = self._fps_cache.get(index)
            if order is None:
                if self._synthetic:
                    order = _fps_order(self._clouds[index][:, :3],
                                       cfg.num_points)
                else:
                    path, _ = self._items[index]
                    fps_npy = f"{path}.fps{cfg.num_points}.npy"
                    if os.path.isfile(fps_npy):
                        order = np.load(fps_npy)
                    else:
                        pcd, _ = self._load_raw(index)
                        order = _fps_order(np.asarray(pcd[:, :3]),
                                           cfg.num_points)
                        tmp = fps_npy[:-4] + f".tmp{os.getpid()}.npy"
                        np.save(tmp, order)
                        os.replace(tmp, fps_npy)
                self._fps_cache[index] = order
            return order[:min(cfg.num_points, n_avail)]
        return randchoice(rs, n_avail, cfg.num_points)

    def get(self, index: int, rs: np.random.RandomState | None = None,
            seed: int | None = None) -> tuple[np.ndarray, int]:
        """One item. Pass either an explicit RandomState (legacy) or a seed;
        with a seed the randomness is a pure function of (seed, index), which
        is what makes threaded loading deterministic."""
        cfg = self.config
        if rs is None:
            rs = np.random.RandomState(
                (int(seed or 0) * 1_000_003 + index * 97 + 13) % (2**31 - 1))
        pcd, label = self._load_raw(index)
        if cfg.occlusion > 0.0:
            # Remove the fraction of the FULL-resolution cloud farthest
            # along a random direction (a half-space cut — the cheap analog
            # of the reference's z-buffer self-occlusion crop,
            # deepgmr_partial.py:139-167), then sample num_points from the
            # remainder so the model always sees its compiled shape.
            full = np.asarray(pcd, np.float32)
            u = rs.randn(3)
            u /= np.linalg.norm(u) + 1e-9
            depth = full[:, :3] @ u
            keep = depth <= np.quantile(depth, 1.0 - cfg.occlusion)
            pcd = full[keep]
            # cached FPS orders index the uncut cloud — invalid here
            idx = randchoice(rs, pcd.shape[0], cfg.num_points)
        else:
            idx = self._sample_indices(index, pcd.shape[0], rs)
        pcd = np.asarray(pcd[idx], np.float32)
        if cfg.noise_sigma > 0.0:
            # Clipped Gaussian jitter on xyz (ref: deepgmr_partial.py:92-106
            # clips at 0.05); normals left stale, as a real sensor's would be.
            noise = rs.randn(*pcd[:, :3].shape) * cfg.noise_sigma
            pcd = pcd.copy()
            pcd[:, :3] += np.clip(noise, -3 * cfg.noise_sigma,
                                  3 * cfg.noise_sigma)
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
        """Yield (clouds [b, n, c], labels [b]); item loads run on a thread
        pool with `prefetch_batches` batches built ahead of the consumer."""
        rs = np.random.RandomState(seed)
        order = rs.permutation(len(self)) if shuffle else np.arange(len(self))
        stop = (len(order) // batch_size) * batch_size if drop_last else len(order)
        starts = list(range(0, stop, batch_size))

        def build(start: int) -> tuple[np.ndarray, np.ndarray]:
            chunk = order[start:start + batch_size]
            items = [self.get(int(i), seed=seed * 131 + start + k)
                     for k, i in enumerate(chunk)]
            clouds = np.stack([c for c, _ in items])
            labels = np.asarray([l for _, l in items], np.int32)
            return clouds, labels

        if self.config.num_workers <= 0 or len(starts) <= 1:
            for start in starts:
                yield build(start)
            return
        with ThreadPoolExecutor(self.config.num_workers) as pool:
            depth = max(self.config.prefetch_batches, 1)
            pending = [pool.submit(build, s) for s in starts[:depth]]
            next_submit = depth
            for _ in starts:
                fut = pending.pop(0)
                if next_submit < len(starts):
                    pending.append(pool.submit(build, starts[next_submit]))
                    next_submit += 1
                yield fut.result()


def get_datasets(config: ModelNet40Config) -> dict[str, ModelNet40]:
    return {split: ModelNet40(config, split) for split in SPLITS}
