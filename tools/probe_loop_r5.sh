#!/bin/bash
# Round-5 backend probe loop (VERDICT r4 item 1): probe the axon TPU backend
# every ~17 min; on the first successful probe, run the bounded measurement
# ladder (tools/run_tpu_measurements.sh) and stop. The timestamped log makes
# the outage auditable (bench.py folds its cadence into the stale artifact).
LOG=${1:-/tmp/tpu_probe_r5.log}
OUT=${2:-/tmp/tpu_measurements_r5}
cd /root/repo || exit 1
while true; do
  ts=$(date -u +%FT%TZ)
  if timeout 200 env PYTHONPATH=/root/.axon_site:/root/repo \
      python -c "import jax; print('PROBE_OK', jax.devices())" \
      > /tmp/tpu_probe_last.out 2>&1; then
    echo "$ts OK $(cat /tmp/tpu_probe_last.out | head -1)" >> "$LOG"
    echo "$ts LADDER_START" >> "$LOG"
    bash tools/run_tpu_measurements.sh "$OUT" > /tmp/tpu_ladder_r5.log 2>&1
    echo "$ts LADDER_DONE rc=$?" >> "$LOG"
    break
  else
    echo "$ts FAIL" >> "$LOG"
  fi
  sleep 1000
done
