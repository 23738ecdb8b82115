"""Weak-scaling benchmark harness: registered scan-pairs/s over a mesh.

BASELINE.json's scale target is ">=80% weak-scaling efficiency of registered
scan-pairs/s from 1 host to 4 hosts". This harness measures exactly that
quantity for the full two-stage pipeline (features -> mutual-NN -> GNC pose),
batch-sharded over the mesh's data axis: work per device is held constant
while the mesh grows, so ideal scaling is throughput proportional to devices.

It runs anywhere: on a TPU slice it measures real ICI scaling; on CPU with
`--xla_force_host_platform_device_count=N` it validates the sharded program
end-to-end (compilation, shardings, collectives) and reports indicative
efficiency. The reference has no equivalent — its only parallelism is
single-process DataParallel (SURVEY.md §2.8).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import DATA_AXIS, batch_sharding, make_mesh, replicated

Array = jax.Array


@dataclass
class WeakScalingResult:
    mesh_sizes: list[int] = field(default_factory=list)
    pairs_per_s: list[float] = field(default_factory=list)

    @property
    def efficiency(self) -> list[float]:
        """Per-device throughput relative to the SMALLEST measured mesh:
        eff(N) = (tput(N)/N) / (tput(N0)/N0). Equals the classic
        tput(N)/(N*tput(1)) when mesh size 1 is measured."""
        if not self.pairs_per_s:
            return []
        base = self.pairs_per_s[0] / self.mesh_sizes[0]
        return [t / (n * base) for n, t in zip(self.mesh_sizes, self.pairs_per_s)]

    def as_dict(self) -> dict:
        return {
            "mesh_sizes": self.mesh_sizes,
            "pairs_per_s": [round(x, 3) for x in self.pairs_per_s],
            "efficiency": [round(x, 4) for x in self.efficiency],
        }


def _build_pipeline(model, method: str = "ransac+picp"):
    """One jitted program: features for both clouds of every pair ->
    mutual-NN matching -> robust pose (+dense refinement). Batch-sharded
    in, replicated out. `method` defaults to the SHIPPED preset composition
    (ransac+picp — the recommended reg_* alias method since round 4;
    VERDICT r4 #5 flagged the old bare-GNC harness as unrepresentative)."""
    from ..ops.normals import estimate_normals
    from ..registration.pipeline import register_pair

    def register_batch(variables, src, dst):
        clouds = jnp.concatenate([src, dst], 0)
        x = jnp.concatenate([clouds, estimate_normals(clouds)], -1)
        feats = model.apply(variables, x, train=False)
        f_src, f_dst = feats[: src.shape[0]], feats[src.shape[0]:]

        def one(s, d, fs, fd):
            t, _ = register_pair(s, d, fs, fd, method=method,
                                 noise_bound=0.02, num_hypotheses=256)
            return t

        return jax.vmap(one)(src, dst, f_src, f_dst)

    return register_batch


def registration_weak_scaling(
    mesh_sizes: tuple[int, ...] = (1, 2, 4, 8),
    pairs_per_device: int = 8,
    num_points: int = 256,
    reps: int = 3,
    model=None,
) -> WeakScalingResult:
    """Measure registered pairs/s at each mesh size with constant
    per-device batch (weak scaling). `model` defaults to a reduced flagship
    (same architecture, smaller widths) so the harness runs on CPU meshes."""
    from ..data.registration_pairs import SyntheticPairs
    from ..models import PVCNNClassifier

    if model is None:
        model = PVCNNClassifier(
            blocks=((16, 1, 8), (32, 1, None)), dim_k=32, is_classify=False,
            point_kernel_formal="dgcnn_kernel", voxel_shape="spherical",
            rot_invariant_preprocess="change_coords", with_local_feat="ppf",
            extra_feature_channels=4, local_neighbors=16,
        )
    n_devices = len(jax.devices())
    sizes = [s for s in mesh_sizes if s <= n_devices]
    max_pairs = max(sizes) * pairs_per_device

    pairs = SyntheticPairs(num_pairs=max_pairs, num_points=num_points,
                           mode="noise", max_amp=0.5)
    src_all = np.stack([pairs[i][0] for i in range(max_pairs)])
    dst_all = np.stack([pairs[i][1] for i in range(max_pairs)])

    sample = jnp.concatenate(
        [jnp.asarray(src_all[:1]), jnp.zeros((1, num_points, 3))], -1)
    variables = jax.jit(
        lambda rng, x: model.init(rng, x, train=False))(
            jax.random.PRNGKey(0), sample)
    register_batch = _build_pipeline(model)

    result = WeakScalingResult()
    for size in sizes:
        mesh = make_mesh(jax.devices()[:size])
        bp = size * pairs_per_device
        shard = batch_sharding(mesh, 3)
        rep = replicated(mesh)
        v = jax.device_put(variables, rep)
        src = jax.device_put(jnp.asarray(src_all[:bp]), shard)
        dst = jax.device_put(jnp.asarray(dst_all[:bp]), shard)
        step = jax.jit(register_batch,
                       in_shardings=(rep, shard, shard),
                       out_shardings=rep)
        # warmup / compile
        float(jnp.sum(step(v, src, dst)))
        t0 = time.perf_counter()
        outs = [step(v, src + 1e-4 * i, dst) for i in range(reps)]
        for o in outs:
            float(jnp.sum(o))
        dt = (time.perf_counter() - t0) / reps
        result.mesh_sizes.append(size)
        result.pairs_per_s.append(bp / dt)
    return result


__all__ = ["WeakScalingResult", "registration_weak_scaling"]
