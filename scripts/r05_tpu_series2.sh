#!/bin/bash
# Round-5 second serial TPU series: warm-cache re-measures, run
# contention-free (nothing else on the host core). One subprocess per
# measurement bounds the tunnel RSS leak; failures don't kill the series.
#
# VERDICT r4 items: 3 (e2e eval number — the first capture was
# cold-cache compile-dominated), 4 (int8 A/B, warm), 2 (coco2017
# steady-state, contention-free), 7 (480-vs-1200 step attribution).
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
L=/tmp/r05_logs2
mkdir -p $L

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S)" | tee -a $L/series.log
  timeout "$to" "$@" >"$L/$name.log" 2>&1
  echo "=== $name rc=$? end $(date +%H:%M:%S)" | tee -a $L/series.log
}

# 1. end-to-end eval, warm persistent cache (item 3): the 16-image run
#    amortizes what compile cost remains and exercises >1 eval batch.
run eval_e2e 5400 python tools/bench_eval.py --modes e2e,batched \
    --eval_batch 8 --n_images 16
run eval_e2e_int8 5400 python tools/bench_eval.py --modes e2e,batched \
    --eval_batch 8 --n_images 16 --int8

# 2. coco2017 steady-state, contention-free, longer window (item 2)
run stab_resnet50_coco2017 3600 python tools/stability_run.py \
    --cfg configs/resnet50_coco2017.yaml --steps 32 --batch_pool 8

# 3. step attribution at 480 to pair with profile_1200 (item 7)
run profile_480 5400 python tools/profile_step.py --image_hw 384 512 \
    --n_valid 2000 --iters 10

# 4. fresh full-protocol bench with the measured anchor in the basis
run bench_full 5400 python bench.py

echo "SERIES2 DONE $(date +%H:%M:%S)" | tee -a $L/series.log
