#!/bin/bash
# Round-5 serial TPU measurement series (runs after the long-horizon run
# finishes; the chip is serialized through one tunnel). One subprocess
# per measurement bounds the documented tunnel RSS leak; a failed step
# does not kill the series. Artifacts land in /root/repo and /tmp/r05_logs.
#
# VERDICT r4 items: 2 (per-config re-measures), 3 (end-to-end eval
# number), 4 (int8 A/B), 6 (TTA HBM report), 7 (1200-bucket MFU),
# 1-tail (>=1k-step bf16-vs-f32 drift).
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
L=/tmp/r05_logs
mkdir -p $L

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S)" | tee -a $L/series.log
  timeout "$to" "$@" >"$L/$name.log" 2>&1
  echo "=== $name rc=$? end $(date +%H:%M:%S)" | tee -a $L/series.log
}

# 1. per-config steady-state re-measures (VERDICT item 2: post-
#    vectorization coco2017 target >=8.5 img/s; refresh the whole table)
for cfgn in resnet50_coco2017 hrnet48_voc resnet50_voc_point vgg16_voc; do
  run stab_$cfgn 3600 python tools/stability_run.py \
      --cfg configs/$cfgn.yaml --steps 16 --batch_pool 4
done

# 2. end-to-end eval number (VERDICT item 3): JPEG -> fused TTA ->
#    detections -> box eval -> mask NMS/RLE -> COCOeval, one wall-clock
run eval_e2e 5400 python tools/bench_eval.py --modes e2e,batched \
    --eval_batch 8 --n_images 8

# 3. int8 A/B on the same protocol (VERDICT item 4)
run eval_e2e_int8 5400 python tools/bench_eval.py --modes e2e,batched \
    --eval_batch 8 --n_images 8 --int8

# 4. TTA HBM report (VERDICT item 6): fit batch 16 or justify 8
run tta_hbm 5400 python tools/tta_hbm_report.py --batches 4,8,16 --measure

# 5. 1200-bucket A/B at pad-multiple 64 + step attribution (item 7)
run bench_1200_pad64 3600 env BENCH_SCALES=1200 BENCH_PAD_MULTIPLE=64 \
    BENCH_SKIP_4096=1 python bench.py
run profile_1200 5400 python tools/profile_step.py --image_hw 1024 1280 \
    --n_valid 2000 --iters 6

# 6. bf16-vs-f32 drift at >=1k steps (VERDICT item 1 tail; extends
#    DRIFT_r03's 200 steps). Same seed/pool on both sides.
run drift_bf16 5400 python tools/stability_run.py --precision bf16_compute \
    --steps 1000 --batch_pool 16 --disp 100 --json_out /tmp/drift_bf16.json
run drift_f32 5400 python tools/stability_run.py --precision f32 \
    --steps 1000 --batch_pool 16 --disp 100 --json_out /tmp/drift_f32.json
python - <<'EOF'
import json
try:
    bf = json.load(open("/tmp/drift_bf16.json"))
    f32 = json.load(open("/tmp/drift_f32.json"))
except OSError as e:
    print("drift combine skipped:", e)
    raise SystemExit(0)
hb, hf = bf["history"], f32["history"]
n = min(len(hb), len(hf))
deltas = [hb[i]["total_loss"] - hf[i]["total_loss"] for i in range(n)]
out = {
    "steps": n,
    "batch_pool": 16,
    "final_total_loss": {"bf16_compute": hb[n - 1]["total_loss"],
                         "f32": hf[n - 1]["total_loss"]},
    "final_delta": deltas[-1],
    "max_trajectory_delta": max(abs(d) for d in deltas),
    "final_branch_losses": {"bf16_compute": hb[n - 1], "f32": hf[n - 1]},
}
with open("/root/repo/DRIFT_r05.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({k: out[k] for k in
                  ("final_delta", "max_trajectory_delta")}))
EOF

echo "SERIES DONE $(date +%H:%M:%S)" | tee -a $L/series.log
