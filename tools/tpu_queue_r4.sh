#!/bin/bash
# Round-4 TPU accuracy queue (VERDICT r3 next #1 and #8), run serially so
# each job has the chip to itself.  Logs to /tmp/tpu_r4_*.log.
set -x
cd /root/repo

# 1. The decisive 83M FP8-training recipe ablation: per-tensor-scaled
#    direct / fp32-master / hybrid-scaled cells + nats gate (VERDICT #1).
ACC_SKIP_LM=1 ACC_SKIP_CONV=1 ACC_REUSE=1 \
  timeout 21600 python tools/accuracy_gates.py --model large \
  --direct_ablation > /tmp/tpu_r4_ablation.log 2>&1

# 2. Trained-MoE serving + hybrid-training gates (VERDICT #8).
ACC_SKIP_LM=1 ACC_SKIP_CONV=1 ACC_REUSE=1 \
  timeout 7200 python tools/accuracy_gates.py --moe \
  > /tmp/tpu_r4_moe.log 2>&1

# 3. Real-data gates on the env-local code corpus at 83M (VERDICT #8).
ACC_REUSE=1 ACC_SKIP_CONV=1 \
  timeout 21600 python tools/accuracy_gates.py --model large \
  --corpus code --out ACCURACY_CODE.json > /tmp/tpu_r4_code.log 2>&1

# 4. AWQ trained-model ablation rows (VERDICT #8).
timeout 7200 python tools/awq_ablate.py > /tmp/tpu_r4_awq.log 2>&1

# 5. 202M-class gates (VERDICT #8) — longest, last.
ACC_REUSE=1 ACC_SKIP_CONV=1 \
  timeout 28800 python tools/accuracy_gates.py --model xl \
  --out ACCURACY_XL.json > /tmp/tpu_r4_xl.log 2>&1

echo DONE > /tmp/tpu_r4_done
