#!/bin/bash
# Round-4 TPU measurement ladder — run the moment the axon backend recovers
# (it has been down since the round-3 bench; bare jax.devices() hangs).
# Each stage is independently bounded so one hang cannot eat the window.
#
#   bash tools/run_tpu_measurements.sh [outdir]
#
# Stages:
#   1. backend probe (200 s bound)
#   2. smoke the new round-4 paths (micro-modes, laplace) on chip
#   3. tools/bench_attn_modes.py  — the real kernel under the four
#      BOUNDED_SCORES × LSE_DTYPE combos (VERDICT item 4 measurement)
#   4. tools/bench_loop.py        — fused vs split sustained loop
#      (VERDICT item 2 measurement, target ≥1100 img/s from uint8)
#   5. bench.py                   — the headline artifact
# Results land in $OUT/*.log; grep for the JSON lines.

set -u
OUT=${1:-/tmp/tpu_measurements}
mkdir -p "$OUT"
export PYTHONPATH=/root/.axon_site:/root/repo

echo "== stage 1: probe"
if ! timeout 200 python -c "import jax; d=jax.devices(); print('PROBE_OK', d)" \
    2>&1 | tee "$OUT/probe.log" | grep -q PROBE_OK; then
  echo "backend still unreachable — aborting (see $OUT/probe.log)"
  exit 1
fi

echo "== stage 2: smoke (micro-modes + laplace + adahessian)"
timeout 1800 python -u tools/tpu_smoke.py micro laplace adahessian \
  2>&1 | tee "$OUT/smoke.log" | tail -5

echo "== stage 3: attention micro-mode ablation"
timeout 1800 python -u tools/bench_attn_modes.py 2>&1 | tee "$OUT/attn_modes.log" | tail -6

echo "== stage 4: sustained loop (fused vs split)"
timeout 2400 python -u tools/bench_loop.py --mode both 2>&1 | tee "$OUT/loop.log" | tail -4

echo "== stage 5: headline bench"
timeout 2400 python -u bench.py 2>&1 | tee "$OUT/bench.log" | tail -2

echo "== stage 6: full-depth MC-dropout ladder (fused in-kernel dropout)"
timeout 2400 python -u tools/bench_mc_dropout.py --selftest \
  2>&1 | tee "$OUT/mc_dropout.log" | tail -6

echo "== done — summarize into PARITY.md / README.md and update"
echo "   bench.py LAST_GOOD_VALUE if the headline moved"
