#!/bin/bash
# Launch specificity v6 (v4 capacity + mouth-rate sync loss — one-lever
# change, see configs/specificity6.yaml) under the stall-detecting
# supervisor.  Resume-safe.
cd /root/repo
mkdir -p runs/specificity6/logs
export PYTHONUNBUFFERED=1
exec python tools/supervise.py \
    --progress-file runs/specificity6/logs/metrics.jsonl \
    --startup-seconds 10800 --stall-seconds 1800 \
    --max-restarts 24 --backoff-seconds 60 -- \
    python -m multimodal_diffusion_tpu.train.train_joint \
        --config configs/mvp.yaml configs/specificity6.yaml --resume
