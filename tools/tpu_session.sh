#!/usr/bin/env bash
# One-command TPU measurement session: run everything the perf roadmap is
# waiting on, in priority order, each step bounded so a flaky tunnel can't
# wedge the session. Run from the repo root when `timeout 90 python -c
# "import jax; print(jax.devices())"` shows a TpuDevice.
#
#   bash tools/tpu_session.sh [OUTDIR]
#
# Steps (each logs to OUTDIR, default /tmp/tpu_session):
#   1. exp_ab_lowerings  — in-model A/B of NEXTOU_SHUFFLE_TRANSPCONV x
#      NEXTOU_PHASE_CONV, batch 3/4 sweep, one-pass-IN reading (~8 min).
#      Decides the conv-lowering defaults (nn/layers.py) before the bench.
#   2. bench.py          — the headline JSON (~10 min incl. TTA).
#   3. profile_breakdown — conv vs pool-GNN vs swin-GNN split for PERF.md.
# Only ONE TPU process may run at a time on this box (CLAUDE.md).
set -u
OUT=${1:-/tmp/tpu_session}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== 1/3 A/B lowerings -> $OUT/ab_lowerings.log"
timeout 1500 python tools/exp_ab_lowerings.py 3 2>&1 | tee "$OUT/ab_lowerings.log"
echo "rc=${PIPESTATUS[0]}" >> "$OUT/ab_lowerings.log"

echo "== 2/3 headline bench -> $OUT/bench.log (flip defaults first if the A/B won!)"
timeout 1800 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.log"
echo "rc=$?" >> "$OUT/bench.log"
cat "$OUT/bench.json"

echo "== 3/3 forward breakdown -> $OUT/breakdown.log"
timeout 1200 python tools/profile_breakdown.py 2>&1 | tee "$OUT/breakdown.log"
echo "rc=${PIPESTATUS[0]}" >> "$OUT/breakdown.log"

echo "done: $OUT"
