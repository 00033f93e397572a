#!/bin/bash
# Launch the specificity run v5 (d=1024/16L capacity bump over v4; all v4
# temporal levers kept, 100k steps) under the stall-detecting supervisor.
# Contingency run — launch only if v4's 100k milestone sweep leaves the
# held-out sync-corr gap < +0.1 (see configs/specificity5.yaml header).
# Resume-safe: rerunning after an outage or host reset continues from the
# newest checkpoint (ckpt_every 5000).
cd /root/repo
mkdir -p runs/specificity5/logs
export PYTHONUNBUFFERED=1
exec python tools/supervise.py \
    --progress-file runs/specificity5/logs/metrics.jsonl \
    --startup-seconds 10800 --stall-seconds 1800 \
    --max-restarts 24 --backoff-seconds 60 -- \
    python -m multimodal_diffusion_tpu.train.train_joint \
        --config configs/mvp.yaml configs/specificity5.yaml --resume
