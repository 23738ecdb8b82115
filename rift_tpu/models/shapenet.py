"""ShapeNet part-segmentation PVCNN.

TPU-native re-design of `PVCNN/models/shapenet_pvcnn.py:11-227`: same
rotation-invariant preprocess family as the classifier, one-hot shape-id
input, per-block feature concatenation plus a repeated global feature, and a
per-point classifier over the 50 part classes.

Input: [b, n, in_ch + num_shapes] channels-last, where the LAST num_shapes
channels are the one-hot shape id (the reference packs them the same way,
shapenet_pvcnn.py:68-69).
"""
from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.lrf import change_coords, pca_align
from ..ops.neighbors import ball_query, grouping
from ..ops.ppf import global_ppf, local_ppf, new_ppf
from ..nn.pvconv import PVConv
from ..nn.shared_mlp import SharedMLP

DEFAULT_SEG_BLOCKS = ((64, 1, 32), (128, 1, 32), (256, 1, None), (512, 1, None))


class ShapeNetPVCNN(nn.Module):
    blocks: Sequence[tuple[int, int, int | None]] = DEFAULT_SEG_BLOCKS
    num_classes: int = 50
    num_shapes: int = 16
    point_kernel_formal: str = "dgcnn_kernel"
    voxel_shape: str = "spherical"
    extra_feature_channels: int = 3
    width_multiplier: float = 1.0
    voxel_resolution_multiplier: float = 1.0
    rot_invariant_preprocess: str | None = "change_coords"
    with_local_feat: bool = False
    local_radius: float = 0.3
    local_neighbors: int = 128
    local_fuse_dim: int = 64

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n, _ = inputs.shape
        one_hot = inputs[..., -self.num_shapes:]
        coords = inputs[..., :3]
        normals = inputs[..., 3:6] if inputs.shape[-1] - self.num_shapes >= 6 else None

        mode = self.rot_invariant_preprocess
        if mode == "ppf":
            assert normals is not None
            features = global_ppf(coords, normals)
        elif mode == "new_ppf":
            assert normals is not None
            features = new_ppf(coords, normals)
        elif mode == "change_coords":
            centered = coords - jnp.mean(coords, axis=-2, keepdims=True)
            features = change_coords(centered)
            if normals is not None:
                features = jnp.concatenate(
                    [features, global_ppf(coords, normals)], axis=-1
                )
        elif mode == "pca":
            features = pca_align(coords)
        elif mode is None:
            features = inputs[..., : inputs.shape[-1] - self.num_shapes]
        else:
            raise ValueError(f"unknown rot_invariant_preprocess {mode!r}")

        if self.with_local_feat:
            assert normals is not None
            idx = ball_query(coords, coords, self.local_radius, self.local_neighbors)
            feats = local_ppf(grouping(coords, idx), grouping(normals, idx),
                              coords, normals)
            fused = SharedMLP([32, self.local_fuse_dim])(feats, train=train)
            features = jnp.concatenate([features, jnp.max(fused, axis=-2)], axis=-1)

        # Backbone with per-block skip concat (shapenet_pvcnn.py:221-226).
        out_features = [one_hot]
        w = self.width_multiplier
        for out_ch, num_blocks, resolution in self.blocks:
            out_ch = int(out_ch * w)
            for _ in range(num_blocks):
                if resolution is None:
                    features = SharedMLP([out_ch])(features, train=train)
                else:
                    features = PVConv(
                        out_channels=out_ch,
                        point_kernel_formal=self.point_kernel_formal,
                        voxel_shape=self.voxel_shape,
                        resolution=int(resolution * self.voxel_resolution_multiplier),
                        with_se=False,
                        normalize=False,
                    )(features, coords, train=train)
            out_features.append(features)
        global_feat = jnp.max(features, axis=-2, keepdims=True)
        out_features.append(jnp.broadcast_to(global_feat, features.shape))
        x = jnp.concatenate(out_features, axis=-1)

        # Per-point classifier [256, 0.2, 256, 0.2, 128, num_classes].
        for width, drop in ((256, 0.2), (256, 0.2), (128, None)):
            x = SharedMLP([int(width * w)])(x, train=train)
            if drop:
                x = nn.Dropout(drop, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)
