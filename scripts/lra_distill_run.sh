#!/bin/bash
# Restart-driven LRA listops distillation (VERDICT r4 task #1).
#
# The environment kills heavy TPU processes ~40 min in; the trainer
# checkpoints params+opt_state+step every --save-every steps and
# auto-resumes, so we run it under `timeout` in a loop until the final
# full-valid "accuracy:" line appears in the log. Kills only the exact
# PID we started (never pattern-kills).
set -u
cd /root/repo
LOG=saves/lra_trainer/distill.log
STEPS=${STEPS:-4000}
mkdir -p saves/lra_trainer
touch "$LOG"
for i in $(seq 1 200); do
  echo "=== supervisor: launch $i $(date -u +%H:%M:%S) ===" >> "$LOG"
  off=$(wc -c < "$LOG")
  timeout -k 30 2100 /opt/venv/bin/python -m sea_tpu.training.lra_trainer \
    --task listops --phase distill --steps "$STEPS" \
    --scale 0.5 --n-train 32768 --depth 10 --max-length 2048 \
    --batch-size 4 --accum 8 --warmup 500 --lr-decay rsqrt \
    --eval-every 250 --save-every 50 >> "$LOG" 2>&1
  rc=$?
  echo "=== supervisor: exit rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
  # check only THIS launch's appended bytes — the append-only log may
  # carry a final-accuracy line from a previous completed run
  if tail -c +$((off + 1)) "$LOG" | grep -q "accuracy:"; then
    echo "=== supervisor: DONE ===" >> "$LOG"
    break
  fi
  sleep 5
done
