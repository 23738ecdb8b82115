#!/bin/bash
# Round-4 chain #7: flagship hard-tier re-score + 40-epoch variant ranking
# (VERDICT r3 #4).
set -u
LOG=/tmp/r04_chain
cd /root/repo
export JAX_PLATFORMS=axon
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
for i in $(seq 1 360); do
  [ -f "$LOG/DONE6" ] && break
  sleep 15
done
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
# 1. Re-score the r3 flagship on the CALIBRATED hard tier (one definition
#    for all r4 artifacts; VERDICT r3 weak #5).
run flagship_rescore 1800 env PYTHONPATH=$P python -m rift_tpu.cli evaluate-cls \
  --preset mn40_sph_dg --ckpt checkpoints/mn40_sph_dg_r3 --best acc \
  --rotations 4 "dataset.synthetic_items={'train':2048,'valid':512,'test':512}"
# 2. 40-epoch equal-budget ranking of all four variants + ablation.
run rank40 14400 env PYTHONPATH=$P python scripts/rank_variants.py \
  --epochs 40 --round 4
touch "$LOG/DONE7"
