#!/usr/bin/env python
"""Rank the backbone variants on the hard eval tier (VERDICT r2 #6).

Trains the four {cube,spherical} x {pointnet,dgcnn} variants — plus a
local-PPF-off ablation of the flagship — under one equal short budget, then
scores each on the standard and hard classification tiers. The reference's
README table (README.md:31-34) is exactly such a ranking on real
ModelNet40; the standard synthetic tier saturates at 1.0, so the hard tier
(train/loop.py:hard_tier_dataset) carries the comparison.

Each training child runs under the stall supervisor semantics inline
(metrics-file watchdog + relaunch) because the TPU tunnel can stall a
dispatch forever. Results append to RANKING_r{N}.jsonl and a markdown
table is rewritten at RANKING_r{N}.md.

Usage:
  python scripts/rank_variants.py [--epochs 40] [--round 3]
      [--variants mn40_sph_dg,mn40_sph_pt,mn40_cu_dg,mn40_cu_pt,ablate_no_local]
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

VARIANTS = ("mn40_sph_dg", "mn40_sph_pt", "mn40_cu_dg", "mn40_cu_pt",
            "ablate_no_local")


def train_one(name: str, preset: str, overrides: list[str], epochs: int,
              stall_sec: float, max_restarts: int = 8) -> bool:
    ckpt_dir = os.path.join("checkpoints", f"rank_{name}")
    metrics = os.path.join(REPO, ckpt_dir, f"{preset}.metrics.jsonl")
    cmd = [sys.executable, "-u", "-m", "rift_tpu.cli", "train",
           "--preset", preset,
           f"train.ckpt_dir={ckpt_dir}",
           f"optim.num_epochs={epochs}",
           "dataset.synthetic_items={'train':2048,'valid':512,'test':512}",
           *overrides]
    sup = [sys.executable, "-u", os.path.join(REPO, "scripts",
                                              "train_supervised.py"),
           "--metrics", metrics, "--target-epoch", str(epochs - 1),
           "--stall-sec", str(stall_sec), "--max-restarts",
           str(max_restarts), "--", *cmd]
    print(f"[{name}] training: {' '.join(cmd)}", flush=True)
    rc = subprocess.run(sup, cwd=REPO).returncode
    return rc == 0


def eval_one(name: str, preset: str, timeout: float) -> dict:
    ckpt_dir = os.path.join("checkpoints", f"rank_{name}")
    argv = [sys.executable, "-m", "rift_tpu.cli", "evaluate-cls",
            "--preset", preset, "--ckpt", ckpt_dir, "--best", "acc",
            "--rotations", "0", "--sweep",
            "dataset.synthetic_items={'train':2048,'valid':512,'test':512}"]
    for attempt in range(2):
        try:
            proc = subprocess.run(argv, cwd=REPO, capture_output=True,
                                  text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            print(f"[{name}] eval TIMEOUT (attempt {attempt})", flush=True)
            time.sleep(75)
            continue
        if proc.returncode != 0:
            print(f"[{name}] eval rc={proc.returncode}\n"
                  + (proc.stdout + proc.stderr)[-1500:], flush=True)
            time.sleep(75)
            continue
        out = {}
        for line in proc.stdout.splitlines():
            m = re.match(r"^([a-z_0-9]+):\s*(-?[0-9.]+)$", line)
            if m:
                out[m.group(1)] = float(m.group(2))
        return out
    return {}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--stall-sec", type=float, default=420.0)
    ap.add_argument("--eval-timeout", type=float, default=1500.0)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    jsonl = os.path.join(REPO, f"RANKING_r{args.round:02d}.jsonl")
    rows = []
    for name in args.variants.split(","):
        if name == "ablate_no_local":
            preset, overrides = "mn40_sph_dg", ["model.with_local_feat=None",
                                                "model.lrf_kind=pca"]
        else:
            preset, overrides = name, ["model.lrf_kind=pca"]
        ok = True
        if not args.skip_train:
            ok = train_one(name, preset, overrides, args.epochs,
                           args.stall_sec)
        metrics = eval_one(name, preset, args.eval_timeout) if ok else {}
        row = {"variant": name, "trained": ok, **metrics}
        rows.append(row)
        with open(jsonl, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"[{name}] {row}", flush=True)

    md = [f"# RANKING — round {args.round}: backbone variants on the hard "
          "tier",
          "",
          f"Equal budget: {args.epochs} epochs, bs 16, 2048-item synthetic "
          "corpus, lrf_kind=pca.",
          "Reference analog: README.md:31-34 (cls accuracy table ranking "
          "cu/sph x pt/dg).",
          "",
          "| variant | acc (standard) | acc (hard) | corruption AUC "
          "(2nd axis) |",
          "|---|---|---|---|"]
    for row in rows:
        md.append(f"| {row['variant']} | {row.get('acc', float('nan')):.4f} "
                  f"| {row.get('acc_hard', float('nan')):.4f} "
                  f"| {row.get('sweep_auc', float('nan')):.4f} |")
    path = os.path.join(REPO, f"RANKING_r{args.round:02d}.md")
    with open(path, "w") as f:
        f.write("\n".join(md) + "\n")
    print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
