#!/bin/bash
# Round-4 TPU queue, part B: waits for the running 83M recipe ablation
# (pid $1), then runs the diagnostic + remaining accuracy jobs in
# priority order.  Logs to /tmp/tpu_r4_*.log.
set -x
cd /root/repo

ABL_PID=${1:-0}
while kill -0 "$ABL_PID" 2>/dev/null; do sleep 30; done

# 2. Role ablation at 83M: which quantization stream carries the gap
#    (also explains/dispels hybrid==direct).
ACC_SKIP_LM=1 ACC_SKIP_CONV=1 ACC_REUSE=1 \
  timeout 21600 python tools/accuracy_gates.py --model large \
  --role_ablation > /tmp/tpu_r4_roles.log 2>&1

# 3. Budget extension at 83M: does the hybrid gap close with 2x steps?
#    (fresh bf16 baseline at 6000 is cached under its own key)
ACC_SKIP_CONV=1 ACC_REUSE=1 \
  timeout 21600 python tools/accuracy_gates.py --model large \
  --steps 6000 --out ACCURACY_BUDGET.json > /tmp/tpu_r4_budget.log 2>&1

# 4. Trained-MoE gates.
ACC_SKIP_LM=1 ACC_SKIP_CONV=1 ACC_REUSE=1 \
  timeout 7200 python tools/accuracy_gates.py --moe \
  > /tmp/tpu_r4_moe.log 2>&1

# 5. Real-data gates on the env-local code corpus at 83M.
ACC_REUSE=1 ACC_SKIP_CONV=1 \
  timeout 21600 python tools/accuracy_gates.py --model large \
  --corpus code --out ACCURACY_CODE.json > /tmp/tpu_r4_code.log 2>&1

# 6. AWQ trained-model ablation rows.
timeout 7200 python tools/awq_ablate.py > /tmp/tpu_r4_awq.log 2>&1

# 7. 202M-class gates — longest, last.
ACC_REUSE=1 ACC_SKIP_CONV=1 \
  timeout 28800 python tools/accuracy_gates.py --model xl \
  --out ACCURACY_XL.json > /tmp/tpu_r4_xl.log 2>&1

echo DONE > /tmp/tpu_r4_done
