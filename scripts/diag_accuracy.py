#!/usr/bin/env python
"""Diagnose the registration accuracy gap (VERDICT r2 item 1).

For a trained trunk: measure (a) mutual-NN match quality against ground
truth (residual distribution, inlier fractions at several gates), (b) RRE
per method including the '+icp'/'+picp' composites, on a small batch of
pairs per mode. Prints a compact table for deciding where accuracy is lost:
features -> matching -> robust solver -> refinement.
"""
from __future__ import annotations

import argparse
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from rift_tpu.train.config import get_config
from rift_tpu.train.loop import resolve_extractor, get_pairs
from rift_tpu.ops.lrf import lrf_basis, lrf_flip_hypotheses
from rift_tpu.ops.normals import estimate_normals
from rift_tpu.ops.neighbors import mutual_nearest_neighbors
from rift_tpu.registration.consensus import consensus_match
from rift_tpu.registration.pipeline import (register_pair,
                                            register_pair_from_matches)
from rift_tpu.registration.metrics import pair_errors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/mn40_sph_dg_r2b")
    ap.add_argument("--name", default="best_acc")
    ap.add_argument("--modes", default="clean,noise,icl_nuim")
    ap.add_argument("--methods",
                    default="ransac,teaserpp,ransac+icp,ransac+picp,"
                            "teaserpp+icp,teaserpp+picp")
    ap.add_argument("--pairs", type=int, default=16)
    ap.add_argument("--flips", action="store_true",
                    help="flip-hypothesis consensus matching")
    args = ap.parse_args()

    cfg = get_config("reg_clean_ransac_cu_dg")
    state, model = resolve_extractor(cfg, ckpt_dir=args.ckpt,
                                     ckpt_name=args.name)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def features(src, dst):
        clouds = jnp.concatenate([src, dst], 0)
        x = jnp.concatenate([clouds, estimate_normals(clouds)], -1)
        feats = model.apply(variables, x, train=False)
        return feats[:src.shape[0]], feats[src.shape[0]:]

    @jax.jit
    def features_flips(src, dst):
        """src features under 4 LRF flips [b,4,n,c], dst primary [b,n,c]."""
        b, n = src.shape[:2]
        clouds = jnp.concatenate([src, dst], 0)
        x = jnp.concatenate([clouds, estimate_normals(clouds)], -1)
        centered = clouds - jnp.mean(clouds, axis=-2, keepdims=True)
        basis = lrf_basis(centered, model.lrf_kind)
        hyp = lrf_flip_hypotheses(basis[:b])
        x_all = jnp.concatenate([jnp.repeat(x[:b], 4, 0), x[b:]], 0)
        lrf_all = jnp.concatenate([hyp.reshape(-1, 3, 3), basis[b:]], 0)
        feats = model.apply(variables, x_all, train=False, lrf=lrf_all)
        return feats[:4 * b].reshape(b, 4, n, -1), feats[4 * b:]

    # One compile per method (noise_bound stays traced so every mode reuses
    # the same executable).
    reg_fns = {}
    for method in args.methods.split(","):
        @partial(jax.jit, static_argnames=("method",))
        def reg(src, dst, f_src, f_dst, keys, nb, method=method):
            def one(s, d, fs, fd, k, nb):
                if args.flips:
                    i1, i2, m, _ = consensus_match(s, d, fs, fd, tau=2 * nb)
                    est, _ = register_pair_from_matches(
                        s, d, i1, i2, m, key=k, method=method, noise_bound=nb)
                else:
                    est, _ = register_pair(s, d, fs, fd, key=k, method=method,
                                           noise_bound=nb)
                return est
            return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, None))(
                src, dst, f_src, f_dst, keys, nb)
        reg_fns[method] = reg

    for mode in args.modes.split(","):
        nb = jnp.float32(0.05 if mode == "icl_nuim" else 0.02)
        pairs = get_pairs(None, 1024, mode, args.pairs)
        batch = next(pairs.batches(batch_size=args.pairs))
        src = jnp.asarray(batch.source)
        dst = jnp.asarray(batch.target)
        gt = jnp.asarray(batch.transform)
        if args.flips:
            f_src, f_dst = features_flips(src, dst)
        else:
            f_src, f_dst = features(src, dst)

        # --- match quality vs ground truth ---
        def match_stats(s, d, fs, fd, t):
            if args.flips:
                i1, i2, m, _ = consensus_match(s, d, fs, fd,
                                               tau=2 * float(nb))
            else:
                i1, i2, m = mutual_nearest_neighbors(fs, fd)
            moved = s[i1] @ t[:3, :3].T + t[:3, 3]
            res = jnp.linalg.norm(moved - d[i2], axis=-1)
            res = jnp.where(m, res, jnp.nan)
            n = jnp.sum(m)
            return (n, jnp.nanmedian(res),
                    jnp.nansum((res < 0.05)) / jnp.maximum(n, 1),
                    jnp.nansum((res < 0.10)) / jnp.maximum(n, 1))
        nm, med, f05, f10 = jax.vmap(match_stats)(src, dst, f_src, f_dst, gt)
        print(f"[{mode}] matches/pair={np.mean(np.asarray(nm)):.0f} "
              f"median_gt_residual={np.nanmean(np.asarray(med)):.4f} "
              f"inlier<0.05={np.mean(np.asarray(f05)):.3f} "
              f"inlier<0.10={np.mean(np.asarray(f10)):.3f}", flush=True)

        # --- structural floors/culprits ---
        # matching floor: median nearest-SAMPLE distance between the
        # gt-aligned clouds (perfect features could not beat this)
        from rift_tpu.ops.lrf import global_lrf
        from rift_tpu.ops.neighbors import pairwise_sqdist

        @jax.jit
        def floors(s, d, t):
            moved = s @ t[:3, :3].T + t[:3, 3]
            nn = jnp.sqrt(jnp.min(pairwise_sqdist(moved, d), axis=-1))
            # LRF consistency: canonical frames agree iff basis_d ~
            # basis_s @ R_gt^T; report the rotation angle of the mismatch.
            bs = global_lrf(s - s.mean(0))
            bd = global_lrf(d - d.mean(0))
            m = bd @ t[:3, :3] @ bs.T
            ang = jnp.degrees(jnp.arccos(jnp.clip(
                (jnp.trace(m) - 1) / 2, -1, 1)))
            return jnp.median(nn), ang
        nn_med, lrf_ang = jax.vmap(floors)(src, dst, gt)
        la = np.asarray(lrf_ang)
        print(f"[{mode}] nn_floor_median={np.mean(np.asarray(nn_med)):.4f} "
              f"lrf_mismatch_deg: med={np.median(la):.2f} "
              f"frac>5deg={np.mean(la > 5):.2f} "
              f"frac>30deg={np.mean(la > 30):.2f}", flush=True)

        for method in args.methods.split(","):
            keys = jax.random.split(jax.random.PRNGKey(0), src.shape[0])
            est = reg_fns[method](src, dst, f_src, f_dst, keys, nb)
            err = pair_errors(src, gt, est)
            rre = np.asarray(err["rre"])
            print(f"[{mode}] {method:14s} rre_mean={np.mean(rre):7.3f} "
                  f"rre_med={np.median(rre):7.3f} "
                  f"rte={np.mean(np.asarray(err['rte'])):7.4f} "
                  f"rmse={np.mean(np.asarray(err['rmse'])):7.4f}", flush=True)


if __name__ == "__main__":
    main()
