"""EXPERIMENT (round 5, not integrated): Pallas 3-D SAME conv as K-packed
im2col matmuls.

Outcome (scripts/microbench6.py, v5e, same day): raw XLA conv at the
flagship widths is ALREADY at 0.73-0.99 MFU (stage1 71->64: 0.727,
64->64: 0.857; stage2 64->128: 0.876, 128->128: 0.990) — the PVConv
stage-level MFU (0.31/0.50 in ROOFLINE_r05) is diluted by vox/devox and
block glue (BN/LeakyReLU/SE elementwise passes, dgcnn point branch), not
by the conv. This kernel is numerically correct (rel maxdiff ~1e-3 vs
the XLA conv at r=8/16) but fails Mosaic compilation at r=32 flagship
shapes and cannot beat a 88-99%-MFU baseline, so it stays a documented
experiment.

Drop-in for the voxel-branch ``nn.Conv(cout, (3,3,3), padding="SAME")``
inside PVConv (`nn/pvconv.py:113-118`; ref workload `PVCNN/modules/
pvconv.py:29-39`). XLA's conv on the [b, r, r, r, c] grids plateaus at
~50-60% MFU at the flagship widths because each 3x3x3 tap contracts only
cin=64..128 channels (K < 128 on the MXU) and the implicit im2col streams
the grid once per tap from HBM.

This kernel keeps the WHOLE padded voxel grid of one cloud resident in
VMEM ([r^3 + 2P, cin] bf16, ~4.5-9 MB at r=32) and expresses the 27 taps
as 14 matmuls whose K dimension stacks TWO taps (K = 2*cin = 128/256 —
full systolic depth), with N = cout. Tap shifts become dynamic row
slices of the resident grid; boundary wrap along the two minor spatial
axes is masked with iota-derived row masks (the major axis is covered by
the zero padding itself).

Accumulation is f32 (matches XLA's conv accumulation for bf16 inputs);
tap-order reassociation vs XLA's conv makes outputs tolerance-equal, not
bitwise. Eval-path only (no custom VJP); the caller gates on `train`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tap_pairs():
    """27 taps as 15 K-stacked pairs, paired WITHIN a k-group so both
    members share the same sublane offset class (off mod 8 = k mod 8)."""
    out = []
    for k in (-1, 0, 1):
        group = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)]
        for p in range(4):
            out.append((group[2 * p], group[2 * p + 1]))
        out.append((group[8], None))
    return out


def _conv3d_kernel(xpad_ref, w_ref, out_ref, *, r: int, cin_p: int,
                   cout: int, chunk: int, pad: int, n_chunks: int):
    ci = pl.program_id(1)
    base = pad + ci * chunk
    # voxel coords of the chunk rows (flat index f -> (d1, d2, d3), d3 minor)
    f = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    d3 = jax.lax.rem(f, r)
    d2 = jax.lax.rem(jax.lax.div(f, r), r)
    # per-offset validity of the two minor axes (major axis: zero padding)
    ok_j = {-1: d2 >= 1, 0: None, 1: d2 <= r - 2}
    ok_k = {-1: d3 >= 1, 0: None, 1: d3 <= r - 2}

    def shifted(tap):
        i, j, k = tap
        off = (i * r + j) * r + k
        # Sublane alignment: off is a static int; split it into an aligned
        # dynamic start (base is a multiple of 8 by construction) plus a
        # static sub-slice of a chunk+8 superset. Taps are PAIRED within a
        # k-group (off mod 8 = k mod 8), so both concat operands carry the
        # same sublane offset — a Mosaic requirement for lane-concat.
        q, rem = divmod(off, 8)
        start = pl.multiple_of(base + 8 * q, 8)
        xb = xpad_ref[0, pl.ds(start, chunk + 8), :]
        xb = jnp.reshape(xb, (chunk + 8, cin_p))
        x = jax.lax.slice_in_dim(xb, rem, rem + chunk, axis=0)
        mask = None
        if ok_j[j] is not None:
            mask = ok_j[j]
        if ok_k[k] is not None:
            mask = ok_k[k] if mask is None else (mask & ok_k[k])
        if mask is not None:
            x = jnp.where(mask, x, jnp.bfloat16(0))
        return x

    acc = jnp.zeros((chunk, cout), jnp.float32)
    for p, (t1, t2) in enumerate(_tap_pairs()):
        x1 = shifted(t1)
        # a k-group has 9 taps: 4 pairs + 1 single (zero-weight 2nd half)
        x2 = shifted(t2) if t2 is not None else x1
        xx = jnp.concatenate([x1, x2], axis=1)  # [chunk, 2*cin_p]
        acc = acc + jax.lax.dot_general(
            xx, w_ref[p],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("r", "chunk", "interpret"))
def conv3d_same_pallas(x: Array, w: Array, r: int, chunk: int = 4096,
                       interpret: bool = False) -> Array:
    """SAME 3x3x3 conv, channels-last.

    x [b, r, r, r, cin] (bf16 recommended), w [3, 3, 3, cin, cout] ->
    [b, r, r, r, cout] in x.dtype. No bias (caller adds).
    """
    b = x.shape[0]
    cin, cout = w.shape[-2], w.shape[-1]
    r3 = r * r * r
    chunk = min(chunk, r3)
    assert r3 % chunk == 0, (r3, chunk)
    cin_p = _round_up(cin, 8)
    xf = x.reshape(b, r3, cin).astype(jnp.bfloat16)
    wf = w.astype(jnp.bfloat16)
    if cin_p != cin:
        xf = jnp.pad(xf, ((0, 0), (0, 0), (0, cin_p - cin)))
        wf = jnp.pad(wf, ((0, 0), (0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
    pad = _round_up(r * r + r + 1, 8)
    xpad = jnp.pad(xf, ((0, 0), (pad, pad), (0, 0)))
    # taps -> 15 K-stacked same-k pairs [15, 2*cin_p, cout]
    wt = wf.reshape(27, cin_p, cout)

    def tap_index(tap):
        i, j, k = tap
        return ((i + 1) * 3 + (j + 1)) * 3 + (k + 1)

    pairs = []
    for t1, t2 in _tap_pairs():
        w1 = wt[tap_index(t1)]
        w2 = wt[tap_index(t2)] if t2 is not None else jnp.zeros_like(w1)
        pairs.append(jnp.concatenate([w1, w2], axis=0))
    wp = jnp.stack(pairs, axis=0)  # [n_pairs, 2*cin_p, cout]

    n_chunks = r3 // chunk
    out = pl.pallas_call(
        functools.partial(_conv3d_kernel, r=r, cin_p=cin_p, cout=cout,
                          chunk=chunk, pad=pad, n_chunks=n_chunks),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, r3 + 2 * pad, cin_p), lambda bi, ci: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((15, 2 * cin_p, cout), lambda bi, ci: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, cout), lambda bi, ci: (bi, ci, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r3, cout), x.dtype),
        interpret=interpret,
    )(xpad, wp)
    return out.reshape(b, r, r, r, cout)
