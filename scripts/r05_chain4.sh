#!/bin/bash
# Round-5 chain #4: re-run the T=96 drift map + battery map step with
# multi-view landmark association (merge_voxel), refreshing
# MAP_DRIFT_r05.json and the VALIDATION map row.
set -u
LOG=/tmp/r05_chain
cd /root/repo
export JAX_PLATFORMS=axon
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
P=/root/repo:/root/.axon_site
for i in $(seq 1 1440); do
  [ -f "$LOG/DONE3" ] && break
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
run map_drift2 3600 env PYTHONPATH=$P python scripts/map_drift.py \
  --ckpt checkpoints/mn40_sph_pt_r4 --name best_acc
run battery_map 3600 env PYTHONPATH=$P python scripts/validate_flagship.py \
  --ckpt checkpoints/mn40_sph_pt_r4 --name best_acc --round 5 \
  --timeout 2400 --steps map
touch "$LOG/DONE4"
