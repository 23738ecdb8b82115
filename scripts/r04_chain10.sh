#!/bin/bash
# Round-4 chain #10: full sph_pt flagship training (the 40-epoch ranking +
# regcmp winner), map-metric dump for the step-RRE discrepancy, battery on
# the new flagship, cu_pt regcmp, pointnet-kernel bench.
set -u
LOG=/tmp/r04_chain
cd /root/repo
export JAX_PLATFORMS=axon
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
for i in $(seq 1 720); do
  [ -f "$LOG/DONE9" ] && break
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
# 1. Map product dump (r3 flagship, same battery config) for the step-RRE
#    vs edge-RRE metric discrepancy analysis.
run map_dump 1800 env PYTHONPATH=$P RIFT_MAP_DUMP=/tmp/map_dump.npz \
  python -m rift_tpu.cli map-sequence --preset reg_icl_nuim_teaserpp_cu_dg \
  --ckpt checkpoints/mn40_sph_dg_r3 --best acc evaluate.method=ransac+picp
# 2. Full sph_pt flagship (the ranking winner), PCA LRF, 120 epochs.
CK=checkpoints/mn40_sph_pt_r4
run train_pt_flagship 7200 env PYTHONPATH=$P python -u scripts/train_supervised.py \
  --metrics "$CK/mn40_sph_pt.metrics.jsonl" --target-epoch 119 \
  --stall-sec 420 --max-restarts 8 -- \
  python -u -m rift_tpu.cli train --preset mn40_sph_pt \
  "train.ckpt_dir=$CK" optim.num_epochs=120 model.lrf_kind=pca \
  "dataset.synthetic_items={'train':2048,'valid':512,'test':512}"
# 3. Battery on the new flagship (refreshes VALIDATION_r04 to the new
#    recommended default).
run battery_pt 10800 env PYTHONPATH=$P python scripts/validate_flagship.py \
  --ckpt "$CK" --name best_acc --round 4
# 4. cu_pt registration comparison (hard-tier cls winner; flagship doc row).
run regcmp_cu_pt 3600 env PYTHONPATH=$P python -m rift_tpu.cli evaluate \
  --preset reg_icl_nuim_ransac_cu_dg --ckpt checkpoints/rank_mn40_cu_pt \
  --best acc --methods ransac,ransac+pl "evaluate.batch_pairs=25"
# 5. Pointnet-kernel bench (the recommended flagship's throughput).
run bench_pt 1800 env PYTHONPATH=$P BENCH_KERNEL=pointnet python bench.py
touch "$LOG/DONE10"
