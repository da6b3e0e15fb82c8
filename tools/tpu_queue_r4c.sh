#!/bin/bash
# Round-4 TPU queue, part C: waits for the running budget-extension job
# (pid $1), then serializes the remaining accuracy + perf work.
set -x
cd /root/repo

BUD_PID=${1:-0}
while kill -0 "$BUD_PID" 2>/dev/null; do sleep 30; done

# 1. Role ablation rerun (the first attempt crashed on the bwd-only
#    cotangent-dtype bug, now fixed).
ACC_SKIP_LM=1 ACC_SKIP_CONV=1 ACC_REUSE=1 \
  timeout 21600 python tools/accuracy_gates.py --model large \
  --role_ablation > /tmp/tpu_r4_roles2.log 2>&1

# 2. Seed variance of the headline cells (bf16/hybrid/hybrid-scaled x3).
ACC_SKIP_LM=1 ACC_SKIP_CONV=1 ACC_REUSE=1 \
  timeout 21600 python tools/accuracy_gates.py --model large \
  --seed_ablation > /tmp/tpu_r4_seeds.log 2>&1

# 3. Trained-draft speculation bench (chip must be otherwise idle).
timeout 7200 python tools/bench_spec_trained.py \
  > /tmp/tpu_r4_spec.log 2>&1

# 4. Perf envelope with the two-length timing fix + new paged path.
timeout 7200 python tools/bench_extras.py > /tmp/tpu_r4_extras.log 2>&1

# 5. Paged-vs-ring A/B (scatter vs side) + spec-engine rows.
timeout 7200 python tools/bench_paged.py > /tmp/tpu_r4_paged.log 2>&1
timeout 7200 python tools/bench_spec_engine.py \
  > /tmp/tpu_r4_speceng.log 2>&1

# 6. Headline bench (embeds the refreshed PERF_EXTRAS + ACCURACY).
timeout 7200 python bench.py > /tmp/tpu_r4_bench.log 2>&1

# 6. Trained-MoE gates.
ACC_SKIP_LM=1 ACC_SKIP_CONV=1 ACC_REUSE=1 \
  timeout 7200 python tools/accuracy_gates.py --moe \
  > /tmp/tpu_r4_moe.log 2>&1

# 7. Real-data gates on the env-local code corpus at 83M.
ACC_REUSE=1 ACC_SKIP_CONV=1 \
  timeout 21600 python tools/accuracy_gates.py --model large \
  --corpus code --out ACCURACY_CODE.json > /tmp/tpu_r4_code.log 2>&1

# 8. AWQ trained-model ablation rows.
timeout 7200 python tools/awq_ablate.py > /tmp/tpu_r4_awq.log 2>&1

# 9. 202M-class gates — longest, last.
ACC_REUSE=1 ACC_SKIP_CONV=1 \
  timeout 28800 python tools/accuracy_gates.py --model xl \
  --out ACCURACY_XL.json > /tmp/tpu_r4_xl.log 2>&1

echo DONE > /tmp/tpu_r4_done
