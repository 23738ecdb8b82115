#!/bin/bash
# Round-4 chain #9: map step-RRE diagnosis, ICL RRE-bound sweep, stacked
# bench, slope-based ROOFLINE_r04.
set -u
LOG=/tmp/r04_chain
cd /root/repo
export JAX_PLATFORMS=axon
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
for i in $(seq 1 720); do
  [ -f "$LOG/DONE8" ] && break
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
CK="--ckpt checkpoints/mn40_sph_dg_r3 --best acc"
run map_diag 1800 env PYTHONPATH=$P python -m rift_tpu.cli map-sequence \
  --preset reg_icl_nuim_teaserpp_cu_dg $CK evaluate.method=ransac+picp
i=0
for ov in \
  "evaluate.num_hypotheses=4000" \
  "evaluate.inlier_threshold=0.065" \
  "evaluate.inlier_threshold=0.075" \
  "evaluate.ransac_irls_shrink=0.6" \
  "evaluate.ransac_irls=6" \
  "evaluate.num_hypotheses=4000 evaluate.ransac_irls_shrink=0.6"; do
  i=$((i+1))
  run "icl_sweep_$i" 1500 env PYTHONPATH=$P python -m rift_tpu.cli evaluate \
    --preset reg_icl_nuim_ransac_cu_dg $CK --methods ransac \
    "evaluate.batch_pairs=25" $ov
done
run bench_stacked 1800 env PYTHONPATH=$P python bench.py
run roofline_r04 2400 env PYTHONPATH=$P python scripts/roofline_report.py
touch "$LOG/DONE9"
