#!/bin/bash
# Launch the specificity run v4 (temporal sync-contrastive loss +
# phoneme-rate mouth tokens, 100k steps) under the stall-detecting
# supervisor.  Resume-safe: rerunning after an outage or host reset
# continues from the newest checkpoint (ckpt_every 5000).
cd /root/repo
mkdir -p runs/specificity4/logs
export PYTHONUNBUFFERED=1
exec python tools/supervise.py \
    --progress-file runs/specificity4/logs/metrics.jsonl \
    --startup-seconds 10800 --stall-seconds 1800 \
    --max-restarts 24 --backoff-seconds 60 -- \
    python -m multimodal_diffusion_tpu.train.train_joint \
        --config configs/mvp.yaml configs/specificity4.yaml --resume
