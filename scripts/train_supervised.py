#!/usr/bin/env python
"""Supervise a long training run over a flaky device tunnel.

The single-chip TPU tunnel on this setup occasionally stalls a dispatch
forever (all host threads futex-parked, no progress). Training resumes
cleanly from the rolling checkpoint (train/checkpoint.py), so the pragmatic
fix is a watchdog: launch the run, watch its metrics JSONL for progress,
kill -9 the exact child when it goes stale, wait out the device-lease
release (~60 s), relaunch with resume. Exits when the target epoch is
reached or max restarts are exhausted.

Usage:
  python scripts/train_supervised.py --metrics PATH --target-epoch N \
      [--stall-sec 240] [--lease-sec 75] [--max-restarts 50] -- CMD...
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def last_epoch(metrics_path: str) -> int:
    if not os.path.isfile(metrics_path):
        return -1
    epoch = -1
    with open(metrics_path) as f:
        for line in f:
            try:
                epoch = max(epoch, int(json.loads(line).get("epoch", -1)))
            except (ValueError, KeyError):
                continue
    return epoch


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", required=True)
    ap.add_argument("--target-epoch", type=int, required=True)
    ap.add_argument("--stall-sec", type=float, default=240.0)
    ap.add_argument("--lease-sec", type=float, default=75.0)
    ap.add_argument("--max-restarts", type=int, default=50)
    ap.add_argument("--log", default=None)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command after --")

    out = open(args.log, "ab") if args.log else None
    for attempt in range(args.max_restarts + 1):
        if last_epoch(args.metrics) >= args.target_epoch:
            print(f"[supervisor] target epoch reached; done", flush=True)
            return 0
        # Launch only when the device is actually obtainable: attaching while
        # a killed client's lease lingers wedges the new client too, and
        # killing a client mid-attach seems to extend the wedge.
        for probe_try in range(40):
            try:
                probe = subprocess.run(
                    [sys.executable, "-c",
                     "import jax, jax.numpy as jnp;"
                     "print(float(jnp.ones((8,8)).sum()))"],
                    timeout=90, capture_output=True, check=False)
                if probe.returncode == 0:
                    break
                rc = probe.returncode
            except subprocess.TimeoutExpired:
                rc = "timeout"
            print(f"[supervisor] device probe {probe_try} failed "
                  f"(rc={rc}); waiting 30s", flush=True)
            time.sleep(30)
        print(f"[supervisor] launch attempt {attempt}: {' '.join(cmd)}",
              flush=True)
        child = subprocess.Popen(cmd, stdout=out or sys.stdout,
                                 stderr=subprocess.STDOUT)
        stale_since = time.time()
        last_mtime = 0.0
        while child.poll() is None:
            time.sleep(15)
            try:
                mtime = os.stat(args.metrics).st_mtime
            except OSError:
                mtime = 0.0
            if mtime != last_mtime:
                last_mtime = mtime
                stale_since = time.time()
            if time.time() - stale_since > args.stall_sec:
                print(f"[supervisor] no metrics progress for "
                      f"{args.stall_sec:.0f}s; killing pid {child.pid}",
                      flush=True)
                child.kill()
                child.wait()
                break
        if child.returncode == 0 and last_epoch(args.metrics) >= args.target_epoch:
            print("[supervisor] completed", flush=True)
            return 0
        print(f"[supervisor] child exited rc={child.returncode}; waiting "
              f"{args.lease_sec:.0f}s for the device lease", flush=True)
        time.sleep(args.lease_sec)
    print("[supervisor] max restarts exhausted", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
