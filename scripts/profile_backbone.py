"""TPU timing: PVConv backbone sub-ops at flagship shapes."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.models import PVCNNClassifier
from rift_tpu.ops.normals import estimate_normals
from rift_tpu.ops.pallas.spherical_fast import (
    spherical_avg_voxelize_fast, spherical_trilinear_devoxelize_fast)
from rift_tpu.ops.lrf import change_coords
from rift_tpu.ops.ppf import global_ppf


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        float(jnp.sum(jax.tree.leaves(fn(*args))[0]))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        float(jnp.sum(jax.tree.leaves(o)[0]))
    return (time.perf_counter() - t0) / reps


def main():
    b, n, r = 128, 1024, 32
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)
    feat64 = jnp.asarray(rng.randn(b, n, 64).astype(np.float32)).astype(jnp.bfloat16)
    x6 = jnp.concatenate([coords, coords], -1)

    # full forward, no local branch
    model_nl = PVCNNClassifier(
        blocks=((64, 1, 32), (128, 1, 32), (256, 1, None), (512, 1, None)),
        dim_k=512, is_classify=False,
        point_kernel_formal="dgcnn_kernel", voxel_shape="spherical",
        rot_invariant_preprocess="change_coords", with_local_feat=None,
        extra_feature_channels=4, with_coeff=True, with_se=True,
        dtype="bfloat16")
    v = model_nl.init(jax.random.PRNGKey(0), x6[:1], train=False)
    t_nl = timeit(jax.jit(lambda v, x: model_nl.apply(v, x, train=False)), v, x6)
    print(f"forward(no local)  {t_nl*1e3:8.2f} ms")

    t_vox = timeit(jax.jit(lambda f, c: spherical_avg_voxelize_fast(f, c, r)), feat64, coords)
    print(f"sph_vox_fast c=64  {t_vox*1e3:8.2f} ms")
    grid, inds, nc = spherical_avg_voxelize_fast(feat64, coords, r)
    gridf = grid.astype(jnp.float32)
    t_dev = timeit(jax.jit(lambda g, ncc, i: spherical_trilinear_devoxelize_fast(g, ncc, i, r)), gridf, nc, inds)
    print(f"sph_devox_fast     {t_dev*1e3:8.2f} ms")

    # conv3d pair at r=32 c=64->64 bf16 channels-last
    import flax.linen as nn
    class TwoConv(nn.Module):
        @nn.compact
        def __call__(self, v):
            for _ in range(2):
                v = nn.Conv(64, (3, 3, 3), padding="SAME", dtype=jnp.bfloat16)(v)
                v = nn.leaky_relu(v, 0.1)
            return v
    tc = TwoConv()
    gv = grid.reshape(b, r, r, r, 64)
    vv = tc.init(jax.random.PRNGKey(0), gv[:1])
    t_conv = timeit(jax.jit(lambda vv, g: tc.apply(vv, g)), vv, gv)
    print(f"conv3d x2 c=64     {t_conv*1e3:8.2f} ms")

    # dgcnn center gather: take_along_axis rows from [b, r^3, c]
    flat = grid.reshape(b, r * r * r, 64)
    def dg(flat, inds):
        safe = jnp.maximum(inds, 0)
        return jnp.take_along_axis(flat, safe[..., None], axis=-2)
    t_dg = timeit(jax.jit(dg), flat, inds)
    print(f"dgcnn row gather   {t_dg*1e3:8.2f} ms")

    t_nrm = timeit(jax.jit(estimate_normals), coords)
    print(f"estimate_normals   {t_nrm*1e3:8.2f} ms")
    t_lrf = timeit(jax.jit(change_coords), coords)
    print(f"change_coords      {t_lrf*1e3:8.2f} ms")
    nrm = estimate_normals(coords)
    t_gp = timeit(jax.jit(global_ppf), coords, nrm)
    print(f"global_ppf         {t_gp*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
