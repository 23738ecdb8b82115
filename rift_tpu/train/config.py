"""Experiment configuration: typed dataclasses + hierarchical presets +
dot-path CLI overrides.

Replaces the reference's import-time global-mutation config system
(`utils/config.py`: a global `configs` tree mutated by importing modules,
with `--configs.a.b=v` eval-parsed overrides, SURVEY.md §3.3) with explicit
dataclasses, while preserving the capabilities: hierarchical experiment
presets, leaf experiments, and `a.b=v` command-line overrides.

The preset names mirror the reference experiment tree
(`configs/modelnet40/pvcnn/experiments/...`): classification leaves
{sph,cu} x {dg,pt} (exp13 = 'mn40_sph_dg'), and registration leaves
{clean,noise,partial,icl_nuim} x {ransac,fgr,teaserpp}.
"""
from __future__ import annotations

import ast
import dataclasses
from dataclasses import dataclass, field
from typing import Any

from ..data.modelnet40 import ModelNet40Config
from ..data.sequences import SequenceConfig


@dataclass
class ModelConfig:
    # ref: configs/modelnet40/pvcnn/__init__.py:5-9 + exp13.py
    blocks: tuple = ((64, 1, 32), (128, 1, 32), (256, 1, None), (512, 1, None))
    dim_k: int = 512
    num_classes: int = 40
    point_kernel_formal: str = "dgcnn_kernel"
    voxel_shape: str = "spherical"
    with_coeff: bool = True
    with_se: bool = True
    extra_feature_channels: int = 0
    width_multiplier: float = 1.0
    voxel_resolution_multiplier: float = 1.0
    is_classify: bool = True
    rot_invariant_preprocess: str | None = "change_coords"
    # 'reference' = farthest-point LRF (reference parity);
    # 'pca' = resample-stable PCA frame (ops/lrf.py:pca_lrf) — the flagship
    # uses this: the reference LRF's sample sensitivity is the dominant
    # matching-error source on independently resampled pairs.
    lrf_kind: str = "reference"
    with_local_feat: str | None = "ppf"
    with_transform_fine_tune: bool = False
    use_new_coords_for_voxel: bool = False
    local_neighbors: int = 128
    dtype: str | None = None       # 'bfloat16' -> conv/MLP stacks on the MXU at bf16


@dataclass
class OptimConfig:
    # ref: configs/modelnet40/__init__.py:12-13 (Adam 1e-3) +
    # SO3_SO3/__init__.py weight_decay 1e-6 + CosineAnnealingLR(T_max=epochs)
    lr: float = 1e-3
    weight_decay: float = 1e-6
    num_epochs: int = 250
    schedule: str = "cosine"
    grad_clip: float | None = None


@dataclass
class TrainConfig:
    batch_size: int = 16          # ref: SO3_SO3/__init__.py:14
    eval_batch_size: int = 32
    valid_interval: int = 1
    steps_per_epoch: int | None = None  # cap (useful for smoke runs)
    ckpt_dir: str = "checkpoints"
    log_every: int = 10
    half_precision: bool = False   # bfloat16 activations in conv/mlp stacks
    # Data-parallel training over a jax.sharding.Mesh of all local devices
    # (the TPU-native redesign of the reference's unconditional
    # nn.DataParallel wrap, train.py:116-117). Auto-on when >1 device and
    # batch_size divides the device count; False forces single-device.
    data_parallel: bool = True
    # At every valid epoch whose (epoch+1) is divisible by K, register a
    # small synthetic pair battery with the current trunk and track
    # rre/rte/succ as best-able metrics — surfaces feature-quality
    # regressions during training instead of at battery time. Runs inside
    # the valid_interval gate, so effective cadence is the LCM of the two
    # intervals. 0 = off (default: the probe costs one extra compile).
    reg_probe_interval: int = 0
    reg_probe_pairs: int = 16


@dataclass
class EvalConfig:
    # ref: deepgmr_* leaf configs (method + h5 path). Base estimators
    # 'ransac' | 'fgr' | 'teaserpp' | 'icp'; any of the first three may
    # carry a '+icp' (dense point-to-point polish) or '+picp'
    # (point-to-point then point-to-plane) suffix — the composite refines
    # the robust correspondence-level estimate with dense geometry and is
    # what the flagship presets use (registration/pipeline.py docstring).
    method: str = "teaserpp"
    pairs_path: str | None = None  # h5 file; None -> synthetic pairs
    # 'clean' | 'noise' | 'partial' | 'icl_nuim' | 'partialK' (e.g.
    # 'partial0.5': controlled overlap-sweep tier, K = source-overlap
    # fraction — data/registration_pairs.py)
    pairs_mode: str = "noise"
    num_pairs: int = 100
    num_points: int = 1024
    noise_bound: float = 0.02
    inlier_threshold: float = 0.08
    num_hypotheses: int = 1000     # ref RANSAC max_iter=1000
    # RANSAC post-refit Tukey IRLS depth and optional tighter-c second
    # phase (registration/ransac.py; sweepable for the ICL RRE bound).
    ransac_irls: int = 3
    ransac_irls_shrink: float = 1.0
    # Batched eval: pairs per jitted dispatch (one vmapped program per batch;
    # the ref's per-pair loop `deepgmr_mn40.py:71-97` becomes ~2 dispatches
    # per 100 pairs). 1 reproduces per-pair dispatch behavior.
    batch_pairs: int = 64
    # Checkpoint selection (ref: train.py:231-243 --eval_ckpt_pth /
    # --best_ckpt_to_test / common fallback). None -> config.train.ckpt_dir.
    ckpt_dir: str | None = None
    ckpt_name: str = "common"      # or 'best_<metric>'
    # Voxelize in the canonical (LRF) frame at eval: makes per-point trunk
    # features exactly rotation-invariant (param-compatible with trunks
    # trained under SO(3) augmentation at use_new_coords_for_voxel=False;
    # the reference leaves the voxel grid in the raw rotated frame, which
    # breaks point-for-point matching under large rotations).
    canonical_voxel: bool = True
    # Flip-hypothesis consensus matching (registration/consensus.py):
    # source features under all 4 right-handed LRF sign assignments, best
    # hypothesis by rigidity consistency. Removes the canonical frame's
    # sign ambiguity (the measured dominant catastrophic matching failure);
    # costs 2.5x the feature forward at eval only.
    flip_hypotheses: bool = True


@dataclass
class ExperimentConfig:
    name: str = "mn40_sph_dg"
    seed: int = 0                  # ref: configs/__init__.py:5
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    dataset: ModelNet40Config = field(default_factory=ModelNet40Config)
    evaluate: EvalConfig = field(default_factory=EvalConfig)
    # Multi-scan mapping (cli map-sequence): trajectory synthesis / h5 input.
    sequence: SequenceConfig = field(default_factory=SequenceConfig)


# ----------------------------------------------------------------------- #
# Presets (the reference's experiment tree, SURVEY.md §2.1 config tree).

def _classification(voxel_shape: str, kernel: str) -> ExperimentConfig:
    cfg = ExperimentConfig(
        name=f"mn40_{'sph' if voxel_shape == 'spherical' else 'cu'}_"
             f"{'dg' if kernel == 'dgcnn_kernel' else 'pt'}",
    )
    cfg.model.voxel_shape = voxel_shape
    cfg.model.point_kernel_formal = kernel
    return cfg


def _registration(method: str, mode: str, voxel_shape: str = "cube",
                  kernel: str = "dgcnn_kernel") -> ExperimentConfig:
    cfg = _classification(voxel_shape, kernel)
    cfg.name = f"reg_{mode}_{method}"
    # ref: deepgmr_mn40_cu_dg/__init__.py — feature-extractor mode with
    # extra_feature_channels=4 (xyz' + global PPF), test batch 1.
    cfg.model.is_classify = False
    cfg.model.extra_feature_channels = 4
    cfg.evaluate.method = method
    # 'icl_nuim' draws adjacent-scan pairs from the synthetic indoor
    # trajectory (data/sequences.py) — scene-scale, small relative motion —
    # instead of round-1's silent alias to 'noise'.
    cfg.evaluate.pairs_mode = mode
    if mode == "icl_nuim":
        cfg.evaluate.noise_bound = 0.05  # scan-resample offsets dominate
        # Calibrated on the adjacent-scan battery (threshold sweep r3:
        # 0.06/0.07/0.08/0.10 -> RRE 0.577/0.540/0.547/0.582; r4 sweep on
        # the same trunk: nh 2000 -> 4000 = 0.529 -> 0.521 deg, threshold
        # 0.065/0.075 and IRLS depth/shrink variants all worse; ~1 ms/pair).
        cfg.evaluate.inlier_threshold = 0.07
        cfg.evaluate.num_hypotheses = 4000
    return cfg


def presets() -> dict[str, ExperimentConfig]:
    out: dict[str, ExperimentConfig] = {}
    for vs in ("spherical", "cube"):
        for k in ("dgcnn_kernel", "pointnet_kernel"):
            cfg = _classification(vs, k)
            out[cfg.name] = cfg
    for mode in ("clean", "noise", "partial", "icl_nuim"):
        for method in ("ransac", "fgr", "teaserpp"):
            for vs, kn in (("cube", "dgcnn_kernel"), ("cube", "pointnet_kernel")):
                cfg = _registration(method, mode, vs, kn)
                suffix = "cu_dg" if kn == "dgcnn_kernel" else "cu_pt"
                cfg.name = f"reg_{mode}_{method}_{suffix}"
                out[cfg.name] = cfg
    # Recommended ICL-NUIM preset (VERDICT r3 #3): 'ransac+picp' is the
    # measured winner on the adjacent-scan battery once pose math runs at
    # f32 precision (ops/precision.py): VALIDATION_r04 icl row
    # RRE 0.149 deg / RTE 0.0021 vs plain ransac 0.622/0.0069 and the
    # BASELINE bound 0.52/0.021 — the '+picp' rotation pathology seen in
    # r3 was bf16 pose-product noise, not the refiner.
    icl = _registration("ransac+picp", "icl_nuim", "cube", "dgcnn_kernel")
    icl.name = "reg_icl_nuim"
    out[icl.name] = icl
    # Same for the object modes: 'ransac+picp' is the measured best (or
    # tied-best) RRE+RTE combination on every mode in VALIDATION_r04
    # (clean 0.062/0.0004, noise 0.310/0.0020, partial 0.340/0.0021) —
    # `reg_<mode>` is the preset a user should reach for; the
    # `reg_<mode>_<method>_*` tree remains the reference-parity sweep.
    for mode in ("clean", "noise", "partial"):
        best = _registration("ransac+picp", mode, "cube", "dgcnn_kernel")
        best.name = f"reg_{mode}"
        out[best.name] = best
    # ShapeNet part segmentation (ref: configs/shapenet/pvcnn + rot_with_ppf)
    seg = ExperimentConfig(name="shapenet_seg")
    seg.model.num_classes = 50
    seg.model.with_se = False
    seg.dataset.num_points = 2048
    seg.train.batch_size = 8
    out[seg.name] = seg
    # tiny smoke preset for CI / CPU runs
    tiny = ExperimentConfig(name="tiny_smoke")
    tiny.model.blocks = ((16, 1, 8), (32, 1, None))
    tiny.model.dim_k = 32
    tiny.model.local_neighbors = 16
    tiny.dataset.num_points = 64
    tiny.dataset.synthetic_items = {"train": 32, "valid": 16, "test": 16}
    tiny.train.batch_size = 4
    tiny.optim.num_epochs = 2
    out[tiny.name] = tiny
    return out


def get_config(name: str) -> ExperimentConfig:
    table = presets()
    if name not in table:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(table)}")
    return table[name]


# ----------------------------------------------------------------------- #
# Dot-path overrides: "model.dim_k=256", "evaluate.method='ransac'".

def apply_overrides(cfg: Any, overrides: list[str]) -> Any:
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override {item!r} must look like a.b=value")
        path, raw = item.split("=", 1)
        keys = path.strip().lstrip("-").split(".")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw  # bare string
        node = cfg
        for key in keys[:-1]:
            node = getattr(node, key)
        leaf = keys[-1]
        if dataclasses.is_dataclass(node) and leaf not in {
            f.name for f in dataclasses.fields(node)
        }:
            raise AttributeError(f"{type(node).__name__} has no field {leaf!r}")
        setattr(node, leaf, value)
    return cfg
