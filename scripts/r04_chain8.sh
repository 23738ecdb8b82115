#!/bin/bash
# Round-4 chain #7 (revised): full validation battery (incl. '+pl' methods
# and the calibrated hard tier) -> 40-epoch variant ranking -> registration
# comparison of the top variants (VERDICT r3 #3/#4).
set -u
LOG=/tmp/r04_chain
cd /root/repo
export JAX_PLATFORMS=axon
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
sleep 80  # lease release after killing chain7
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
# 1. Full battery on the r3 flagship: cls (calibrated hard tier) + all reg
#    modes with the '+pl' composites + map (with the round-4 gated/refresh
#    sequence pipeline).  validate_flagship handles per-step subprocess
#    timeouts itself.
run battery 10800 env PYTHONPATH=$P python scripts/validate_flagship.py \
  --ckpt checkpoints/mn40_sph_dg_r3 --name best_acc --round 4
# 2. Equal-budget 40-epoch ranking (4 variants; the no-local ablation is
#    dropped to fit the round's TPU budget).
run rank40 14400 env PYTHONPATH=$P python scripts/rank_variants.py \
  --epochs 40 --round 4 --variants mn40_sph_dg,mn40_sph_pt,mn40_cu_dg,mn40_cu_pt
# 3. Flagship decision evidence: registration metrics of the two spherical
#    variants at the SAME 40-epoch budget on the icl_nuim analog.
for v in sph_dg sph_pt; do
  run "regcmp_$v" 3600 env PYTHONPATH=$P python -m rift_tpu.cli evaluate \
    --preset reg_icl_nuim_ransac_cu_dg --ckpt "checkpoints/rank_mn40_$v" \
    --best acc --methods ransac,ransac+pl "evaluate.batch_pairs=25"
done
touch "$LOG/DONE8"
