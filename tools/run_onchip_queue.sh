#!/bin/bash
# Sequential on-chip A/B queue for the open round-3 measurements.
#
# Run ONE instance only (remote TPU compiles serialize; two processes
# both blow their timeouts — DESIGN.md round-3 notes). Each leg is a
# separate bench.py process under its own timeout, so a hung tunnel
# kills the leg, not the queue. Results append to ONCHIP_QUEUE.log;
# the one-line JSON results also collect in ONCHIP_QUEUE_RESULTS.jsonl.
#
# Queue (see memory/round3-state.md):
#   1. baseline      — current defaults (s2d SR + lane-padded vocab CE)
#   2. pad_off       — ECAMP_PAD_VOCAB=0 (the previously measured 571.1
#                      program; decides whether lane-padding stays default)
#   3. fused_adamw   — ECAMP_FUSED_ADAMW=1 (expected ceiling ~+6%)
#   4. baseline_rep  — drift check
set -u
cd "$(dirname "$0")/.."
LOG=ONCHIP_QUEUE.log
OUT=ONCHIP_QUEUE_RESULTS.jsonl
leg() {
  name=$1; shift
  echo "=== $name start $(date -u +%FT%TZ)" | tee -a "$LOG"
  timeout 3600 env "$@" python bench.py > /tmp/leg_out.txt 2> >(tail -40 >> "$LOG")
  rc=$?
  cat /tmp/leg_out.txt >> "$LOG"
  json=$(grep -m1 '^{' /tmp/leg_out.txt || true)
  if [ -n "$json" ]; then
    echo "{\"leg\": \"$name\", \"result\": $json}" >> "$OUT"
  fi
  echo "=== $name exit=$rc $(date -u +%FT%TZ)" | tee -a "$LOG"
}

leg baseline      ECAMP_DUMMY=1
leg pad_off       ECAMP_PAD_VOCAB=0
leg fused_adamw   ECAMP_FUSED_ADAMW=1
leg baseline_rep  ECAMP_DUMMY=1
echo "queue done $(date -u +%FT%TZ)" | tee -a "$LOG"
