#!/bin/bash
# End-of-round wrap for an in-flight specificity run: stop training at the
# latest step (clean SIGTERM -> final checkpoint), wait for the chip to
# free, then run the TPU milestone eval sweep on whatever checkpoints
# exist.  Use when the round clock runs out before training does; the next
# round resumes with --resume.
#
# Usage: tools/wrap_specificity_run.sh <trainer_pid> <run_dir> <n> [overlays...]
set -u
cd "$(dirname "$0")/.."
PID=$1; OUT=$2; N=${3:-16}; shift 3 || true
if kill -0 "$PID" 2>/dev/null; then
  echo "[wrap] SIGTERM trainer $PID (clean checkpoint + exit)"
  kill -TERM "$PID"
  for i in $(seq 1 120); do
    kill -0 "$PID" 2>/dev/null || break
    sleep 5
  done
  kill -0 "$PID" 2>/dev/null && { echo "[wrap] trainer still up after 600s"; exit 1; }
fi
echo "[wrap] trainer stopped; checkpoints:"
ls "$OUT/checkpoints" | grep -E '^[0-9]+$' | sort -n
# drop any tmp dir a killed save left behind
rm -rf "$OUT"/checkpoints/*.orbax-checkpoint-tmp
steps=$(ls "$OUT/checkpoints" | grep -E '^[0-9]+$' | sort -n | tail -4)
bash tools/spec_eval_sweep.sh "$OUT" "$N" $steps -- "$@"
