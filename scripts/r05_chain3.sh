#!/bin/bash
# Round-5 chain #3 (after chain 2): partial0.7 battery top-up (locates the
# overlap cliff between the legacy partial tier and partial0.5), then a
# same-day re-bench with the component-wise normals epilogue.
set -u
LOG=/tmp/r05_chain
cd /root/repo
export JAX_PLATFORMS=axon
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
P=/root/repo:/root/.axon_site
for i in $(seq 1 1440); do
  [ -f "$LOG/DONE2" ] && break
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
run battery07 4800 env PYTHONPATH=$P python scripts/validate_flagship.py \
  --ckpt checkpoints/mn40_sph_pt_r4 --name best_acc --round 5 \
  --timeout 2400 --steps reg --modes partial0.7
run bench2 3600 env PYTHONPATH=$P python bench.py
touch "$LOG/DONE3"
