"""ModelNet40 variant emitting a 4-way PCA-reflection label.

TPU-native equivalent of `datasets/modelnet40_4class.py` (SURVEY.md §2.6):
each rotated sample carries, besides its shape class, a label in {0,1,2,3}
encoding which of the first two principal axes flipped sign between the
source cloud's PCA basis and the rotated cloud's PCA basis (ref
`get4label`, modelnet40_4class.py:78-93). Used by the PCA-canonicalization
baseline (`models.PointNetClassifier(rot_invariant='pca')`) to probe the
reflection ambiguity of SVD alignment.
"""
from __future__ import annotations

import numpy as np

from .modelnet40 import ModelNet40, ModelNet40Config
from .transforms import random_rotation


def reflection_label(source: np.ndarray, target: np.ndarray,
                     rotation: np.ndarray) -> int:
    """4-way label from the sign pattern of the first two principal axes.

    source/target [n, 3] (target = source @ R.T + t), rotation [3, 3].
    Semantics of ref modelnet40_4class.py:78-93: PCA bases su, tu of the
    centered clouds; sign s_j = sign((R.T tu / su)[0, j]) for j in {0, 1};
    label = 2 * (1 - s_0) / 2 + (1 - s_1) / 2  in {0..3}.
    """
    s = source - source.mean(0, keepdims=True)
    t = target - target.mean(0, keepdims=True)
    su, _, _ = np.linalg.svd(s.T @ s)
    tu, _, _ = np.linalg.svd(t.T @ t)
    ratio = rotation[:3, :3].T @ tu / np.where(np.abs(su) < 1e-12, 1e-12, su)
    signs = (1 - np.sign(ratio[0, :2])) / 2
    return int(signs[0] * 2 + signs[1])


class ModelNet40FourClass(ModelNet40):
    """ModelNet40 whose samples are (cloud, (class_label, reflection_label)).

    Rotation is always applied here — after the unrotated sample is drawn —
    so the label can compare the pre- and post-rotation PCA bases (the
    4-class task is only defined for rotated clouds, ref
    modelnet40_4class.py:44-56).
    """

    def __init__(self, config: ModelNet40Config, split: str):
        import copy

        config = copy.deepcopy(config)
        config.random_rot = {s: False for s in config.random_rot}
        super().__init__(config, split)

    def get(self, index: int, rs: np.random.RandomState):
        cloud, label = super().get(index, rs)
        points = cloud[:, :3]
        normals = cloud[:, 3:] if cloud.shape[1] > 3 else None
        if normals is not None:
            trans, target, target_normals = random_rotation(
                points, normals, rs=rs)
            out = np.concatenate([target, target_normals], axis=1)
        else:
            trans, target = random_rotation(points, rs=rs)
            out = target
        four = reflection_label(points, target, trans[:3, :3])
        return out.astype(np.float32), (label, four)
