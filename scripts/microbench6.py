#!/usr/bin/env python
"""Round-5 wave 3: Pallas K-packed conv3d vs XLA conv at stage-2 widths.

Usage: python scripts/microbench6.py [correctness|timing|all]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from conv3d_kernel_experiment import conv3d_same_pallas

K_LO, K_HI = 2, 6


def wall(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fn(*args))
    return (time.perf_counter() - t0) / reps


def slope_time(stage, reps, *data):
    def many(k):
        @jax.jit
        def f(x, *data):
            def body(c, i):
                return c + stage(x + c * 1e-12 + i * 1e-6, *data), None
            s, _ = lax.scan(body, jnp.zeros((), jnp.float32),
                            jnp.arange(k, dtype=jnp.float32))
            return s
        return f

    x = jnp.zeros(())
    t_lo = wall(many(K_LO), x, *data, reps=reps)
    t_hi = wall(many(K_HI), x, *data, reps=reps)
    return (t_hi - t_lo) / (K_HI - K_LO) * 1e3


def xla_conv(x, w):
    return lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    if mode in ("correctness", "all"):
        for r, cin, cout in [(8, 24, 32), (8, 71, 64), (16, 64, 128)]:
            x = jnp.asarray(rng.normal(size=(2, r, r, r, cin)),
                            jnp.bfloat16)
            w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1,
                            jnp.float32)
            ref = xla_conv(x, w).astype(jnp.float32)
            got = conv3d_same_pallas(x, w, r).astype(jnp.float32)
            scale = float(jnp.max(jnp.abs(ref))) + 1e-9
            md = float(jnp.max(jnp.abs(ref - got))) / scale
            print(f"r={r} cin={cin} cout={cout}: rel maxdiff {md:.2e}",
                  flush=True)

    if mode in ("timing", "all"):
        b, r = 128, 32
        for cin, cout, tag in [(64, 128, "stage2 conv1"),
                               (128, 128, "stage2 conv2"),
                               (71, 64, "stage1 conv1"),
                               (64, 64, "stage1 conv2")]:
            x = jnp.asarray(rng.normal(size=(b, r, r, r, cin)),
                            jnp.bfloat16)
            w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1,
                            jnp.float32)
            tflop = 2 * 27 * b * r**3 * cin * cout / 1e12
            for name, fn in [("xla", xla_conv),
                             ("pallas", lambda xx, ww: conv3d_same_pallas(
                                 xx, ww, r))]:
                try:
                    ms = slope_time(
                        lambda p, xx, ww, f=fn: jnp.sum(
                            f(xx + p.astype(jnp.bfloat16), ww).astype(
                                jnp.float32)),
                        2, x, w)
                    mfu = tflop / (ms / 1e3) / 197.0
                    print(f"{tag:14s} {name:7s} {ms:7.2f} ms  MFU {mfu:.3f}",
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"{tag:14s} {name:7s} FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
