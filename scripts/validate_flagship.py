#!/usr/bin/env python
"""Post-training validation battery for the flagship checkpoint.

Runs, against a trained `mn40_sph_dg` checkpoint:
  1. classification test accuracy under random SO(3) (standard + hard tier)
     + rotation-consistency (ref protocol: README.md:25-34, SO3_SO3 configs);
  2. registration RRE/RTE/RMSE on clean / noise / partial pairs and the
     ICL-NUIM-analog adjacent-scan set, for each robust estimator INCLUDING
     the '+icp'/'+picp' dense-refinement composites
     (ref: README.md:36-61, datasets/deepgmr_mn40.py:71-97);
  3. the multi-scan mapping pipeline (odometry -> pose graph -> BA -> ATE),
     with the same flip-consensus matching + composite refinement per edge.

Each step is run in a fresh subprocess under a timeout so a wedged TPU
tunnel stalls one step, not the battery; failed steps are retried once and
otherwise recorded as failed. Results append to VALIDATION_r{N}.jsonl and a
human summary is rewritten at VALIDATION_r{N}.md.

Usage:
  python scripts/validate_flagship.py --ckpt checkpoints/mn40_sph_dg_r2b \
      [--name best_acc] [--round 3] [--timeout 1800] [--steps cls,reg,map]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# partial0.7/0.5/0.3 = the hard overlap sweep (VERDICT r4 #4): asymmetric
# quantile-band crops along a common world direction so K IS the
# source-overlap fraction — see data/registration_pairs.py.
REG_MODES = ("clean", "noise", "partial", "partial0.7", "partial0.5",
             "partial0.3", "icl_nuim")
# '+pl' (plane-only polish) included since round 4: on scene scans the
# point-to-point prestep of '+picp' biases rotation (icl analog: ransac
# 0.93 -> +picp 1.66 deg) while '+pl' improves RTE without that cost —
# VERDICT r3 #3/#4 require it validated, not just implemented.
REG_METHODS = ("teaserpp", "ransac", "fgr", "teaserpp+picp", "ransac+picp",
               "ransac+pl")


def run_step(tag: str, argv: list[str], timeout: float, retries: int = 1
             ) -> dict:
    for attempt in range(retries + 1):
        t0 = time.time()
        try:
            proc = subprocess.run(
                argv, cwd=REPO, capture_output=True, text=True,
                timeout=timeout)
        except subprocess.TimeoutExpired:
            print(f"[{tag}] TIMEOUT after {timeout:.0f}s "
                  f"(attempt {attempt})", flush=True)
            continue
        out = proc.stdout + proc.stderr
        if proc.returncode != 0:
            print(f"[{tag}] rc={proc.returncode} (attempt {attempt})\n"
                  + out[-2000:], flush=True)
            continue
        metrics = {}
        for line in proc.stdout.splitlines():
            m = re.match(r"^([a-z_0-9]+):\s*(-?[0-9.]+(?:e-?\d+)?)$", line)
            if m:
                metrics[m.group(1)] = float(m.group(2))
        return {"tag": tag, "ok": True, "metrics": metrics,
                "sec": round(time.time() - t0, 1)}
    return {"tag": tag, "ok": False, "metrics": {},
            "sec": round(time.time() - t0, 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--name", default=None,
                    help="checkpoint name inside --ckpt (common/best_acc)")
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--timeout", type=float, default=1800.0)
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    ap.add_argument("--steps", default="cls,reg,map")
    ap.add_argument("--modes", default=",".join(REG_MODES))
    ap.add_argument("--methods", default=",".join(REG_METHODS))
    ap.add_argument("--data-root", default=None, metavar="DIR",
                    help="real-data root: uses DIR/modelnet40_normal_resampled"
                         " for the cls step and the DeepGMR h5 test files "
                         "(modelnet_clean.h5 / modelnet_noisy.h5 / "
                         "icl_nuim_test.h5, the reference's eval inputs — "
                         "configs/.../deepgmr_mn40_cu_pt/*.py) for the reg "
                         "modes; anything missing falls back to synthetic "
                         "and is flagged in the summary")
    args = ap.parse_args()
    steps = args.steps.split(",")
    modes = args.modes.split(",")
    methods = args.methods.split(",")
    jsonl = os.path.join(REPO, f"VALIDATION_r{args.round:02d}.jsonl")
    py = sys.executable
    plat = ["--platform", args.platform] if args.platform else []
    ckpt_args = ["--ckpt", args.ckpt]
    if args.name and args.name.startswith("best_"):
        ckpt_args += ["--best", args.name.removeprefix("best_")]
    results: list[dict] = []

    def record(res):
        results.append(res)
        with open(jsonl, "a") as f:
            f.write(json.dumps(res) + "\n")
        print(f"[{res['tag']}] ok={res['ok']} {res['metrics']} "
              f"({res['sec']}s)", flush=True)

    # Real-data resolution (VERDICT r3 #7: one-command real-data battery).
    H5_BY_MODE = {"clean": "modelnet_clean.h5", "noise": "modelnet_noisy.h5",
                  "icl_nuim": "icl_nuim_test.h5"}
    mn40_root, h5_paths = None, {}
    if args.data_root:
        probe = os.path.join(args.data_root, "modelnet40_normal_resampled")
        if os.path.isdir(probe):
            mn40_root = probe
        for mode, fname in H5_BY_MODE.items():
            for sub in ("", "test"):
                cand = os.path.join(args.data_root, sub, fname)
                if os.path.isfile(cand):
                    h5_paths[mode] = cand
                    break
        print(f"real data: mn40={'yes' if mn40_root else 'SYNTHETIC'} "
              f"h5={sorted(h5_paths) or 'SYNTHETIC'}", flush=True)

    if "cls" in steps:
        cls_data = ([f"dataset.root='{mn40_root}'"] if mn40_root else
                    ["dataset.synthetic_items="
                     "{'train':2048,'valid':512,'test':512}"])
        record(run_step(
            "cls",
            [py, "-m", "rift_tpu.cli", *plat, "evaluate-cls",
             "--preset", "mn40_sph_dg", *ckpt_args, "--rotations", "4",
             *cls_data],
            args.timeout))
    if "reg" in steps:
        for mode in modes:
            # ONE step per mode sweeping every method over a shared
            # matching pass (evaluate_registration_sweep): the feature
            # forward dominates compile+runtime and is method-independent.
            # batch_pairs=25: the flip-consensus match program carries
            # 5 clouds per pair; 125-cloud programs are the largest that
            # reliably compile through this setup's remote-compile tunnel.
            data = ([f"evaluate.pairs_path='{h5_paths[mode]}'"]
                    if mode in h5_paths else [])
            # Overlap-sweep tiers reuse the partial preset with the mode
            # overridden (their pair synthesis is parameterized, not a
            # separate config subtree).
            preset_mode = "partial" if mode.startswith("partial0") else mode
            if mode.startswith("partial0"):
                data += [f"evaluate.pairs_mode='{mode}'"]
            record(run_step(
                f"reg_{mode}",
                [py, "-m", "rift_tpu.cli", *plat, "evaluate",
                 "--preset", f"reg_{preset_mode}_teaserpp_cu_dg", *ckpt_args,
                 "--methods", ",".join(methods),
                 "evaluate.batch_pairs=25", *data],
                args.timeout))
        if "latency" in steps or "reg" in steps:
            # Single-pair dispatch latency probe (VERDICT r4 #8): ONE
            # 1-pair program so the battery can state both numbers — the
            # batched-throughput s/pair in the rows above (dispatch
            # amortized over batch_pairs, the serving number) and the
            # per-pair wall latency the reference's reg_time corresponds
            # to (deepgmr_mn40.py:148-151: one pair per iteration).
            record(run_step(
                "reg_latency",
                [py, "-m", "rift_tpu.cli", *plat, "evaluate",
                 "--preset", "reg_noise_teaserpp_cu_dg", *ckpt_args,
                 "--methods", "ransac+picp",
                 "evaluate.batch_pairs=1", "evaluate.num_pairs=8"],
                args.timeout))
    if "map" in steps:
        # ransac+picp edges: the measured-best edge method on the
        # adjacent-scan battery (RRE 0.53 / RTE 0.0074 at nh=2000).
        record(run_step(
            "map",
            [py, "-m", "rift_tpu.cli", *plat, "map-sequence",
             "--preset", "reg_icl_nuim_teaserpp_cu_dg", *ckpt_args,
             "evaluate.method=ransac+picp"],
            args.timeout))

    # Rebuild the summary from the ACCUMULATED jsonl (latest entry per tag)
    # so partial re-runs (--steps cls after recalibration, a retried mode)
    # refresh their rows without dropping the others.
    merged: dict[str, dict] = {}
    with open(jsonl) as f:
        for line in f:
            r = json.loads(line)
            if r["ok"] or r["tag"] not in merged:
                merged[r["tag"]] = r
    # summarize over the UNION of modes/methods ever recorded, so a partial
    # re-run refreshes its rows without dropping the others
    all_modes = [m for m in REG_MODES if f"reg_{m}" in merged]
    all_modes += [m for m in modes if m not in all_modes]
    slugs_seen = set()
    for r in merged.values():
        for key in r["metrics"]:
            if key.endswith("_rre"):
                slugs_seen.add(key[:-4])
    all_methods = [m for m in list(REG_METHODS) + methods
                   if m.replace("+", "_") in slugs_seen]
    seen = set()
    all_methods = [m for m in all_methods
                   if not (m in seen or seen.add(m))]
    write_summary(list(merged.values()), args.ckpt, args.round, all_modes,
                  all_methods)
    return 0 if all(r["ok"] for r in results) else 1


def write_summary(results: list[dict], ckpt: str, rnd: int,
                  modes=REG_MODES, methods=REG_METHODS) -> None:
    path = os.path.join(REPO, f"VALIDATION_r{rnd:02d}.md")
    by = {r["tag"]: r for r in results}
    lines = [
        f"# VALIDATION — round {rnd} flagship checkpoint",
        "",
        f"Checkpoint: `{ckpt}` (trained on the procedural asymmetric-composite",
        "corpus — real ModelNet40 is not redistributable in this environment,",
        "see `rift_tpu/data/synthetic.py`). Reference targets in BASELINE.md",
        "are on real ModelNet40/ICL-NUIM; these numbers validate the *system*",
        "(learned features -> flip-consensus matching -> robust pose ->",
        "dense refinement) end to end on like-structured data.",
        "",
    ]
    cls = by.get("cls")
    if cls:
        m = cls["metrics"]
        lines += [
            "## Classification (random SO(3) test split)",
            "",
            f"- accuracy (standard tier): "
            f"**{m.get('acc', float('nan')):.4f}** "
            "(reference sph-dg on real MN40: 0.897, README.md:34)",
            f"- accuracy (hard tier, train/loop.py:hard_tier_dataset — "
            f"calibrated jitter/noise/occlusion at 512 pts): "
            f"**{m.get('acc_hard', float('nan')):.4f}**",
            f"- rotation agreement (4 random SO(3) copies): "
            f"{m.get('rot_agree', float('nan')):.4f}",
            f"- logit drift across rotations: "
            f"{m.get('logit_drift', float('nan')):.4f}",
            "",
        ]
    lat = by.get("reg_latency")
    lat_note = ""
    if lat and lat["metrics"]:
        lm = lat["metrics"]
        lat_note = (f"Single-pair dispatch latency (batch_pairs=1, "
                    f"ransac+picp, noise mode): "
                    f"**{lm.get('ransac_picp_reg_time', float('nan')):.4f} "
                    "s/pair** — this is what the reference's `reg_time` "
                    "measures (deepgmr_mn40.py:148-151, one pair per "
                    "iteration incl. per-dispatch overhead). ")
    lines += ["## Registration (100 pairs each, trained trunk, "
              "flip-consensus matching)", "",
              "reg_time below is BATCHED-throughput seconds/pair "
              "(batch_pairs=25 per dispatch, dispatch overhead amortized "
              "— the serving number). " + lat_note,
              "",
              "| set | method | RRE (deg) | RTE | RMSE | success | "
              "reg_time (batched s/pair) |",
              "|---|---|---|---|---|---|---|"]
    for mode in modes:
        r = by.get(f"reg_{mode}")
        if not r:
            continue
        m = r["metrics"]
        for method in methods:
            slug = method.replace("+", "_")
            if not r["ok"] and f"{slug}_rre" not in m:
                lines.append(f"| {mode} | {method} | FAILED | | | | |")
                continue
            lines.append(
                f"| {mode} | {method} "
                f"| {m.get(f'{slug}_rre', float('nan')):.3f} "
                f"| {m.get(f'{slug}_rte', float('nan')):.4f} "
                f"| {m.get(f'{slug}_rmse', float('nan')):.4f} "
                f"| {m.get(f'{slug}_succ', float('nan')):.2f} "
                f"| {m.get(f'{slug}_reg_time', float('nan')):.4f} |")
    lines.append("")
    if any(m.startswith("partial0") for m in modes):
        lines += [
            "### Low-overlap sweep analysis (partialK tiers)",
            "",
            "partialK controls the SOURCE-overlap fraction directly "
            "(data/registration_pairs.py: quantile-band crops along a "
            "common world direction; measured source coverage ≈ 0.56 "
            "legacy partial / 0.48 / 0.35 / 0.22 for K=0.7/0.5/0.3). "
            "The cliff sits between 0.56 and 0.48 coverage: K=0.7 is "
            "bimodal succeed-or-die (best rmse_succ 0.63, mean RRE ~53° "
            "dominated by the failures), and below ~0.4 coverage every "
            "method collapses (~100° RRE): the "
            "failure is in MATCHING, not the solvers — asymmetric crops "
            "move each cloud's PCA canonicalization frame, so trunk "
            "features live in different frames and mutual-NN inlier "
            "counts drop to ~0-6 of 512. This is descriptor-agnostic: a "
            "frame-free FPFH + full-TEASER cross-check (compatibility "
            "core + TIM) scores the same ~100° with 0-6 true inliers — "
            "the band overlap of smooth procedural shapes simply carries "
            "too little distinctive geometry. The reference's own best "
            "published partial-overlap number is RRE 31.08° "
            "(README.md:61) — this regime is where every "
            "local-correspondence pipeline dies; rmse_succ (fraction "
            "under the RMSE threshold) is the discriminative column "
            "here, and ransac+picp / ransac+pl lead it.",
            "",
            "Hypothesis-budget sweep (same day, partial0.5, "
            "ransac+picp): massive-hypothesis RANSAC is nearly free on "
            "TPU (batched scoring), and raising num_hypotheses 512 → "
            "16384 lifts rmse_succ 0.24 → 0.36 (RRE 95.6° → 83.4°) at "
            "0.024 s/pair batched; 65536 saturates at 0.37 — the "
            "surviving failures have ~zero true inliers, corroborating "
            "the matching-starvation diagnosis. On the bimodal partial0.7 "
            "tier the same recipe lifts ransac+picp to rmse_succ 0.64 / "
            "RRE 47.7° (from 0.60 / 56.4°). Recipe for low-overlap "
            "data: `evaluate.num_hypotheses=16384` with ransac+picp.",
            "",
        ]
    mp = by.get("map")
    if mp:
        m = mp["metrics"]
        lines += [
            "## Multi-scan mapping (north star, ransac+picp edges, joint BA)",
            "",
            "| stage | ATE |",
            "|---|---|",
            f"| odometry | {m.get('ate_odometry', float('nan')):.4f} |",
            f"| pose graph | {m.get('ate_graph', float('nan')):.4f} |",
            f"| bundle adjust | {m.get('ate_ba', float('nan')):.4f} |",
            "",
            f"mean edge inliers: {m.get('mean_edge_inliers', float('nan')):.3f}"
            f" · mean edge RRE: {m.get('mean_edge_rre', float('nan')):.3f} deg"
            f" · step RRE (odom/graph/BA): "
            f"{m.get('step_rre_odom', float('nan')):.3f} / "
            f"{m.get('step_rre_graph', float('nan')):.3f} / "
            f"{m.get('mean_step_rre', float('nan')):.3f} deg",
            "",
        ]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
