#!/bin/bash
# Round-5 third serial TPU series: pad-multiple-64 full protocol A/B
# (VERDICT item 7 — ship or reject finer image buckets), steady-state
# e2e eval with the shared-evaluator patch (item 3), int8 A/B on the
# same steady-state footing (item 4), and the coco2017 step attribution
# (item 2: where do 9.86 -> 7.71 img/s go at C=80?).
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
L=/tmp/r05_logs3
mkdir -p $L

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S)" | tee -a $L/series.log
  timeout "$to" "$@" >"$L/$name.log" 2>&1
  echo "=== $name rc=$? end $(date +%H:%M:%S)" | tee -a $L/series.log
}

run bench_pad64 5400 env BENCH_PAD_MULTIPLE=64 python bench.py
run eval_e2e 5400 python tools/bench_eval.py --modes e2e --eval_batch 8 \
    --n_images 16
run eval_e2e_int8 5400 python tools/bench_eval.py --modes e2e \
    --eval_batch 8 --n_images 16 --int8
run profile_coco 3600 python tools/profile_step.py \
    --cfg configs/resnet50_coco2017.yaml --image_hw 384 512 \
    --n_valid 2000 --iters 10

echo "SERIES3 DONE $(date +%H:%M:%S)" | tee -a $L/series.log
