#!/bin/bash
# One-shot orchestration after the specificity6 run: wait for the trainer
# supervisor to release the chip, then run the speaker-balanced milestone
# sweep, the g=7 comparison eval, the quiet-chip t2i bf16/int8 bench pair,
# and finally launch specificity7 (capacity on top of the v6 lever) under
# the supervisor.  Everything logs under /tmp/post_spec6.log.
set -u
cd "$(dirname "$0")/.."
SUP_PID=${1:?supervisor pid}

echo "[post] waiting for supervisor $SUP_PID to exit"
while kill -0 "$SUP_PID" 2>/dev/null; do sleep 20; done
echo "[post] chip free at $(date -u +%H:%M:%S)"
rm -rf runs/specificity6/checkpoints/*.orbax-checkpoint-tmp

echo "[post] milestone sweep (n=32, speaker-balanced)"
bash tools/spec_eval_sweep.sh runs/specificity6 32 25000 50000 75000 100000

echo "[post] guidance g=7 eval at 100k (n=32) for the v4 comparison"
bash tools/guidance_sweep.sh runs/specificity6 100000 32 7.0

echo "[post] t2i bench pair on the quiet chip"
python bench.py --task t2i --quant none 2>/dev/null | tail -1
python bench.py --task t2i --quant int8 2>/dev/null | tail -1

echo "[post] launching specificity7"
nohup python tools/supervise.py \
  --progress-file runs/specificity7/logs/metrics.jsonl \
  --startup-seconds 10800 --stall-seconds 1800 \
  --max-restarts 24 --backoff-seconds 60 -- \
  python -m multimodal_diffusion_tpu.train.train_joint \
    --config configs/mvp.yaml configs/specificity7.yaml --resume \
  > /tmp/spec7_launch.log 2>&1 &
echo $! > /tmp/spec7.pid
echo "[post] specificity7 supervisor pid $(cat /tmp/spec7.pid)"
