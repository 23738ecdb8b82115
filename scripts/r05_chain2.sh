#!/bin/bash
# Round-5 chain #2: variant ranking with the corruption-sweep second axis
# (reuses the r4 rank checkpoints, --skip-train) + the T=96 drift-curve
# map run. Waits for chain #1 (battery + bench).
set -u
LOG=/tmp/r05_chain
mkdir -p "$LOG"
cd /root/repo
export JAX_PLATFORMS=axon
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
P=/root/repo:/root/.axon_site
for i in $(seq 1 1440); do
  [ -f "$LOG/DONE1" ] && break
  sleep 15
done
run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date +%T)" >> "$LOG/chain.log"
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date +%T)" >> "$LOG/chain.log"
  if [ $rc -ne 0 ]; then
    sleep 75
    timeout "$to" "$@" > "$LOG/$name.retry.log" 2>&1
    echo "=== $name retry rc=$? $(date +%T)" >> "$LOG/chain.log"
  fi
  sleep 20
}
run ranking 7200 env PYTHONPATH=$P python scripts/rank_variants.py \
  --round 5 --skip-train --eval-timeout 2000
run map_drift 3600 env PYTHONPATH=$P python scripts/map_drift.py \
  --ckpt checkpoints/mn40_sph_pt_r4 --name best_acc
touch "$LOG/DONE2"
