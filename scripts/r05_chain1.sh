#!/bin/bash
# Round-5 chain #1: validation battery on the flagship checkpoint with the
# round-5 kernels (factored vox/devox, Pallas normals, TEASER depth) +
# the new overlap-sweep tiers and latency probe, then the restructured
# bench.
set -u
LOG=/tmp/r05_chain
mkdir -p "$LOG"
cd /root/repo
export JAX_PLATFORMS=axon
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
P=/root/repo:/root/.axon_site
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
CK=checkpoints/mn40_sph_pt_r4
run battery 16200 env PYTHONPATH=$P python scripts/validate_flagship.py \
  --ckpt "$CK" --name best_acc --round 5 --timeout 2400
run bench 3600 env PYTHONPATH=$P python bench.py
touch "$LOG/DONE1"
