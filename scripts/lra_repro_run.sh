#!/bin/bash
# Full two-phase LRA listops reproduction (round-5 headline): dense teacher
# then SEA student distillation, both restart-driven across the
# environment's ~40-min process kills (full-state checkpoints + resume in
# both phases). Appends stdout to per-phase logs and mirrors them into the
# git-tracked artifacts/ dir so the evidence survives workspace wipes.
# Kills only the exact PID supervisor `timeout` manages (never pattern-kills).
set -u
cd /root/repo
STEPS=${STEPS:-4000}
mkdir -p saves/lra_trainer artifacts

run_phase() {  # $1=phase $2=log
  local phase=$1 log=$2
  touch "$log"
  for i in $(seq 1 200); do
    echo "=== supervisor: $phase launch $i $(date -u +%H:%M:%S) ===" >> "$log"
    local off
    off=$(wc -c < "$log")
    timeout -k 30 2100 /opt/venv/bin/python -m sea_tpu.training.lra_trainer \
      --task listops --phase "$phase" --steps "$STEPS" \
      --scale 0.5 --n-train 32768 --depth 10 --max-length 2048 \
      --batch-size 4 --accum 8 --warmup 500 --lr-decay rsqrt \
      --eval-every 250 --save-every 50 >> "$log" 2>&1
    local rc=$?
    echo "=== supervisor: $phase exit rc=$rc $(date -u +%H:%M:%S) ===" >> "$log"
    cp "$log" artifacts/ 2>/dev/null
    # check only THIS launch's appended bytes — the append-only log may
    # carry a final-accuracy line from a previous completed run
    if tail -c +$((off + 1)) "$log" | grep -q "accuracy:"; then
      echo "=== supervisor: $phase DONE ===" >> "$log"
      cp "$log" artifacts/ 2>/dev/null
      return 0
    fi
    sleep 5
  done
  return 1
}

run_phase dense saves/lra_trainer/lra_teacher_r5.log || exit 1
run_phase distill saves/lra_trainer/lra_distill_r5.log
