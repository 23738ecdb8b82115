#!/bin/bash
# Round-4 chain #4: fixed micro3 modes (match3/conv3/localppf3) + bench with
# the new fused local-PPF path.
set -u
LOG=/tmp/r04_chain
cd /root/repo
export JAX_PLATFORMS=axon
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
for i in $(seq 1 240); do
  [ -f "$LOG/DONE4" ] && break
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
run micro4_fwd 1800 env PYTHONPATH=$P python scripts/microbench4.py fwd
run micro4_pieces 1800 env PYTHONPATH=$P python scripts/microbench4.py pieces
touch "$LOG/DONE5"
