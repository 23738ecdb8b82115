#!/bin/bash
# Round-4 TPU measurement chain #1: micro-benchmarks of candidate stage
# optimizations, today's stage profile, and the r1->r3 bench bisect
# (all three bench programs run back-to-back on the same day so tunnel
# drift cannot confound the regression story).  One job, sequential,
# per-step timeout + one retry after a lease-release sleep.
set -u
LOG=/tmp/r04_chain
mkdir -p "$LOG" /tmp/bisect/r1 /tmp/bisect/r2
cd /root/repo
export JAX_PLATFORMS=axon
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

run() { # name timeout_s cmd...
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

P=/root/repo:/root/.axon_site
for m in kth match conv gnc localppf; do
  run "micro_$m" 900 env PYTHONPATH=$P python scripts/microbench.py "$m"
done
run micro_gather 900 env PYTHONPATH=$P python scripts/microbench.py gather --batch 32
run profile_stages 1200 env PYTHONPATH=$P python scripts/profile.py stages

# Bench bisect: HEAD (r3 code), r2 snapshot, r1 snapshot.
git archive e2a04f4 | tar -x -C /tmp/bisect/r2
git archive 9886cb0 | tar -x -C /tmp/bisect/r1
run bench_head 1500 env PYTHONPATH=$P python /root/repo/bench.py
run bench_r2 1500 env PYTHONPATH=/tmp/bisect/r2:/root/.axon_site python /tmp/bisect/r2/bench.py
run bench_r1 1500 env PYTHONPATH=/tmp/bisect/r1:/root/.axon_site python /tmp/bisect/r1/bench.py

touch "$LOG/DONE"
echo "chain complete $(date +%T)" >> "$LOG/chain.log"
