#!/bin/bash
# Round-4 endgame: stop the control campaign cleanly, sweep its milestones
# on the freed chip, produce the single-lever attribution table, commit
# everything, and relaunch the control under the supervisor so round 5
# resumes it.  Safe to run once; each step skips work already done.
set -u
cd "$(dirname "$0")/.."

SUP=$(cat /tmp/spec5.pid 2>/dev/null || true)
if [ -n "$SUP" ] && kill -0 "$SUP" 2>/dev/null; then
  echo "[wrap] SIGTERM control supervisor $SUP (trainer checkpoints cleanly)"
  kill -TERM "$SUP"
  for i in $(seq 1 150); do kill -0 "$SUP" 2>/dev/null || break; sleep 5; done
fi
rm -rf runs/specificity5/checkpoints/*.orbax-checkpoint-tmp

echo "[wrap] control metrics snapshot"
mkdir -p docs/specificity5
cp runs/specificity5/logs/metrics.jsonl docs/specificity5/metrics.jsonl 2>/dev/null
git add docs/specificity5/metrics.jsonl \
  && git commit -q -m "specificity5 control: training metrics snapshot (round-4 wrap)" || true

steps=$(ls runs/specificity5/checkpoints 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tr '\n' ' ')
echo "[wrap] control checkpoints: $steps"
bash tools/spec_eval_sweep.sh runs/specificity5 16 $steps

echo "[wrap] paired attribution table (v7 vs capacity-only control)"
python tools/spec_compare.py docs/specificity7 docs/specificity5 \
  --labels "v7(cap+mouthsync)" "ctrl(cap-only)" \
  | tee docs/spec_attribution_r4.md
git add docs/spec_attribution_r4.md \
  && git commit -q -m "single-lever attribution table: v7 vs capacity-only control" || true

echo "[wrap] parity ref-side insurance refresh"
latest=$(ls runs/parity_tiny_ref/checkpoints/step_*.pt 2>/dev/null | sort -t_ -k2 -n | tail -1)
if [ -n "$latest" ]; then
  cp "$latest" docs/parity/ref_run/ && cp runs/parity_tiny_ref/logs/events.out.tfevents.* docs/parity/ref_run/
  git add docs/parity/ref_run && git commit -q -m "parity: reference-run insurance refresh ($(basename "$latest"))" || true
fi

echo "[wrap] relaunch control for round 5 (--resume from its last checkpoint)"
nohup python tools/supervise.py \
  --progress-file runs/specificity5/logs/metrics.jsonl \
  --startup-seconds 10800 --stall-seconds 1800 --grace-seconds 600 \
  --max-restarts 24 --backoff-seconds 60 -- \
  python -m multimodal_diffusion_tpu.train.train_joint \
    --config configs/mvp.yaml configs/specificity5.yaml configs/ckpt12500.yaml --resume \
  > runs/specificity5/logs/supervise_r4b.log 2>&1 &
echo $! > /tmp/spec5.pid
echo "[wrap] control supervisor pid $(cat /tmp/spec5.pid); done"
