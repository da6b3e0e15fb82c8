#!/bin/bash
# Round-4 TPU queue, part J (final): waits for bench.py (pid $1).
cd /root/repo
wait_chip() {
  until timeout 90 python tools/tpu_watchdog_probe.py 2>/dev/null \
      | grep -q "probe ok"; do sleep 120; done
}
run_job() {
  local log=$1 tmo=$2; shift 2
  for attempt in 1 2 3; do
    wait_chip
    echo "=== attempt $attempt $(date) ===" >> "$log"
    if timeout "$tmo" "$@" >> "$log" 2>&1; then return 0; fi
    echo "=== attempt $attempt FAILED rc=$? $(date) ===" >> "$log"
  done
  return 1
}
while kill -0 "${1:-0}" 2>/dev/null; do sleep 30; done

run_job /tmp/tpu_r4_extras3.log 7200 python tools/bench_extras.py
ACC_SKIP_LM=1 ACC_SKIP_CONV=1 ACC_REUSE=1 \
  run_job /tmp/tpu_r4_moe.log 7200 python tools/accuracy_gates.py --moe
run_job /tmp/tpu_r4_awq.log 7200 python tools/awq_ablate.py
ACC_REUSE=1 ACC_SKIP_CONV=1 ACC_SKIP_TRAINING=1 \
  run_job /tmp/tpu_r4_xl.log 14400 python tools/accuracy_gates.py \
  --model xl --out ACCURACY_XL.json
# rerun the headline bench last so BENCH embeds the final artifacts
run_job /tmp/tpu_r4_bench2.log 7200 python bench.py
echo DONE > /tmp/tpu_r4_done
