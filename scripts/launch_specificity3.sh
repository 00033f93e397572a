#!/bin/bash
# Launch the round-3 flagship run v3 (encoder stop-grad, 100k steps) under
# the stall-detecting supervisor.  Resume-safe: rerunning after an outage or
# host reset continues from the newest checkpoint (ckpt_every 5000).
cd /root/repo
mkdir -p runs/specificity3/logs
# child stdout goes to a file: without this, Python block-buffers and the
# startup phase prints (upload progress, compile markers) never appear
export PYTHONUNBUFFERED=1
exec python tools/supervise.py \
    --progress-file runs/specificity3/logs/metrics.jsonl \
    --startup-seconds 10800 --stall-seconds 1800 \
    --max-restarts 24 --backoff-seconds 60 -- \
    python -m multimodal_diffusion_tpu.train.train_joint \
        --config configs/mvp.yaml configs/specificity3.yaml --resume
