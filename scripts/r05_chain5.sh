#!/bin/bash
# Round-5 chain #5: retrain the flagship THROUGH the round-5 kernels
# (exercises the factored vox/devox custom VJPs at training scale), then
# comparison evals vs the r4 checkpoint (no VALIDATION overwrite).
set -u
LOG=/tmp/r05_chain
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
CK=checkpoints/mn40_sph_pt_r5
run train_r5 7200 env PYTHONPATH=$P python -u scripts/train_supervised.py \
  --metrics "$CK/mn40_sph_pt.metrics.jsonl" --target-epoch 119 \
  --stall-sec 420 --max-restarts 8 -- \
  python -u -m rift_tpu.cli train --preset mn40_sph_pt \
  "train.ckpt_dir=$CK" optim.num_epochs=120 model.lrf_kind=pca \
  "dataset.synthetic_items={'train':2048,'valid':512,'test':512}"
run cls_r5 2400 env PYTHONPATH=$P python -m rift_tpu.cli evaluate-cls \
  --preset mn40_sph_pt --ckpt "$CK" --best acc --rotations 0 --sweep \
  "dataset.synthetic_items={'train':2048,'valid':512,'test':512}"
run reg_r5_icl 2400 env PYTHONPATH=$P python -m rift_tpu.cli evaluate \
  --preset reg_icl_nuim_teaserpp_cu_dg --ckpt "$CK" --best acc \
  --methods teaserpp,ransac+picp "evaluate.batch_pairs=25"
run reg_r5_noise 2400 env PYTHONPATH=$P python -m rift_tpu.cli evaluate \
  --preset reg_noise_teaserpp_cu_dg --ckpt "$CK" --best acc \
  --methods teaserpp,ransac+picp "evaluate.batch_pairs=25"
touch "$LOG/DONE5"
