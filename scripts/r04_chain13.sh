#!/bin/bash
# Round-4 chain #13: post-review-fix bench confirmation.
set -u
LOG=/tmp/r04_chain
cd /root/repo
export JAX_PLATFORMS=axon
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
for i in $(seq 1 120); do
  [ -f "$LOG/DONE12" ] && break
  sleep 15
done
echo "=== bench_postfix start $(date +%T)" >> "$LOG/chain.log"
timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site python bench.py > "$LOG/bench_postfix.log" 2>&1
echo "=== bench_postfix rc=$? $(date +%T)" >> "$LOG/chain.log"
touch "$LOG/DONE13"
