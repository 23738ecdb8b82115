"""Analytic roofline / MFU accounting for the pipeline's hot stages.

BASELINE.md demands "kernels at speed-of-light per chip"; this module makes
that checkable: per-stage FLOP and HBM-byte counts from first principles,
chip peaks per device kind, and the roofline time lower bound

    t_min = max(flops / peak_flops, bytes / peak_bandwidth)

so a measured stage time yields `sol_fraction = t_min / t_measured` (1.0 =
speed of light) and `mfu = flops / (t_measured * peak_flops)`. The reference
has no performance accounting at all (SURVEY.md §5-6: wall-clock reg_time
only).

Peaks are per chip. TPU v5e (the bench device): 197 bf16 TFLOP/s on the
MXU, ~0.5x that for f32 dots (f32 runs as multi-pass bf16 with f32
accumulate; we use the conservative 3-pass figure), 819 GB/s HBM. CPU gets
placeholder peaks so the report machinery runs anywhere (numbers are only
meaningful on the TPU).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax


@dataclass(frozen=True)
class ChipPeaks:
    name: str
    flops_bf16: float
    flops_f32: float
    hbm_gbps: float


_PEAKS = {
    # TPU v5e: 197 TFLOP/s bf16, HBM 819 GB/s (public spec). f32 dot ≈ 1/3
    # bf16 (bf16x3 passes). v5p / v4 entries for portability.
    "v5 lite": ChipPeaks("tpu_v5e", 197e12, 197e12 / 3, 819e9),
    "v5e": ChipPeaks("tpu_v5e", 197e12, 197e12 / 3, 819e9),
    "v5p": ChipPeaks("tpu_v5p", 459e12, 459e12 / 3, 2765e9),
    "v4": ChipPeaks("tpu_v4", 275e12, 275e12 / 3, 1228e9),
}


def chip_peaks() -> ChipPeaks:
    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in _PEAKS.items():
        if key in kind:
            return peaks
    return ChipPeaks(f"unknown({kind})", 1e12, 0.5e12, 100e9)


@dataclass
class StageCost:
    """FLOPs + HBM bytes for one stage at fixed shapes (per dispatch)."""
    name: str
    flops: float
    bytes: float
    dtype: str = "f32"  # dominant dot dtype: 'bf16' | 'f32'

    def t_min(self, peaks: ChipPeaks) -> float:
        peak_f = peaks.flops_bf16 if self.dtype == "bf16" else peaks.flops_f32
        return max(self.flops / peak_f, self.bytes / peaks.hbm_gbps)

    def report(self, measured_s: float, peaks: ChipPeaks) -> dict:
        peak_f = peaks.flops_bf16 if self.dtype == "bf16" else peaks.flops_f32
        t_min = self.t_min(peaks)
        return {
            "stage": self.name,
            "measured_ms": round(measured_s * 1e3, 3),
            "flops_g": round(self.flops / 1e9, 2),
            "hbm_gb": round(self.bytes / 1e9, 3),
            "bound": ("compute" if self.flops / peak_f
                      >= self.bytes / peaks.hbm_gbps else "memory"),
            "t_min_ms": round(t_min * 1e3, 3),
            "sol_fraction": round(t_min / max(measured_s, 1e-12), 4),
            "mfu": round(self.flops / (max(measured_s, 1e-12) * peak_f), 4),
        }


F32 = 4  # bytes


def cost_normals(b: int, n: int) -> StageCost:
    """estimate_normals: distance matmul [b,n,n] + two moment matmuls
    (mask@p, mask@(p⊗p): c=3 and 9) + closed-form eig (VPU, negligible)."""
    dist = 2 * b * n * n * 3
    moments = 2 * b * n * n * (3 + 9)
    byts = F32 * b * (n * n + n * (3 + 9 + 3))  # mask materialized worst-case
    return StageCost("normals", dist + moments, byts)


def cost_local_ppf(b: int, n: int, k: int, fuse: tuple[int, int] = (32, 64),
                   bf16: bool = False) -> StageCost:
    """Local-PPF branch: n x n distances, rank-select gather as one-hot dot
    ([b,n,k,n] x [b,n,6]), 4-d PPF (VPU), SharedMLP(4->32->64), masked max."""
    dist = 2 * b * n * n * 3
    gather = 2 * b * n * k * n * 6
    h1, h2 = fuse
    mlp = 2 * b * n * k * (4 * h1 + h1 * h2)
    flops = dist + gather + mlp
    byts = F32 * b * n * k * (6 + 4 + h1 + h2)  # grouped + ppf + activations
    return StageCost("local_ppf", flops, byts, "bf16" if bf16 else "f32")


def cost_pvconv(b: int, n: int, r: int, cin: int, cout: int,
                bf16: bool = False) -> StageCost:
    """One PVConv: voxelize scatter-mean (bw), 2x Conv3d(k=3) on [r,r,r]
    grids, trilinear devox (bw), dgcnn point branch SharedMLP(2cin->cout)."""
    conv = 2 * b * r**3 * 27 * (cin * cout + cout * cout)
    point = 2 * b * n * (2 * cin) * cout
    flops = conv + point
    byts = F32 * b * (n * cin          # voxelize read
                      + r**3 * (cin + 2 * cout)  # grids
                      + n * (8 * cout + cout)    # devox gather + out
                      + n * (2 * cin + cout))    # point branch
    return StageCost(f"pvconv_r{r}_{cin}->{cout}", flops, byts,
                     "bf16" if bf16 else "f32")


def cost_matching(pairs: int, n: int, c: int) -> StageCost:
    """Mutual-NN: one n x n x c distance dot per pair + argmins."""
    flops = 2 * pairs * n * n * c
    byts = F32 * pairs * (2 * n * c + n * n)
    return StageCost("matching", flops, byts)


def cost_gnc(pairs: int, n: int, iters: int = 45) -> StageCost:
    """GNC-TLS: per iteration a residual pass + weighted Kabsch (n x 3
    reductions) — VPU/bandwidth bound small ops."""
    flops = pairs * iters * (n * 40)
    byts = F32 * pairs * iters * n * 12
    return StageCost("gnc", flops, byts)


def flagship_costs(batch_pairs: int = 64, n: int = 1024, k: int = 128,
                   dim_k: int = 512, bf16: bool = True) -> dict[str, StageCost]:
    """Stage costs at the bench.py flagship shapes (2*batch clouds through
    the forward; blocks (64,32),(128,32),(256,-),(512,-))."""
    b = 2 * batch_pairs
    stages = {
        "normals": cost_normals(b, n),
        "local_ppf": cost_local_ppf(b, n, k, bf16=bf16),
        "pvconv1": cost_pvconv(b, n, 32, 7 + 64, 64, bf16=bf16),
        "pvconv2": cost_pvconv(b, n, 32, 64, 128, bf16=bf16),
        "matching": cost_matching(batch_pairs, n, dim_k),
        "gnc": cost_gnc(batch_pairs, n),
    }
    return stages
