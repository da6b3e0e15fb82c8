#!/bin/bash
# Round-4 TPU queue, part F: waits out the tunnel outage (probe loop),
# then runs the remaining perf + accuracy jobs.
set -x
cd /root/repo

until timeout 90 python tools/tpu_watchdog_probe.py 2>/dev/null | grep -q "probe ok"; do
  sleep 120
done
echo "TPU back $(date)" >> /tmp/tpu_r4f_queue.log

timeout 7200 python tools/bench_spec_trained.py > /tmp/tpu_r4_spec.log 2>&1
timeout 7200 python tools/bench_extras.py > /tmp/tpu_r4_extras.log 2>&1
timeout 7200 python tools/bench_paged.py > /tmp/tpu_r4_paged.log 2>&1
timeout 7200 python tools/bench_spec_engine.py > /tmp/tpu_r4_speceng.log 2>&1
timeout 7200 python bench.py > /tmp/tpu_r4_bench.log 2>&1

ACC_SKIP_LM=1 ACC_SKIP_CONV=1 ACC_REUSE=1 \
  timeout 7200 python tools/accuracy_gates.py --moe \
  > /tmp/tpu_r4_moe.log 2>&1

ACC_REUSE=1 ACC_SKIP_CONV=1 \
  timeout 21600 python tools/accuracy_gates.py --model large \
  --corpus code --out ACCURACY_CODE.json > /tmp/tpu_r4_code.log 2>&1

timeout 7200 python tools/awq_ablate.py > /tmp/tpu_r4_awq.log 2>&1

ACC_REUSE=1 ACC_SKIP_CONV=1 \
  timeout 28800 python tools/accuracy_gates.py --model xl \
  --out ACCURACY_XL.json > /tmp/tpu_r4_xl.log 2>&1

echo DONE > /tmp/tpu_r4_done
