#!/bin/bash
# Round-5 post-control orchestration: when the capacity-only control
# (runs/specificity5, configs/specificity5.yaml = v7 minus
# training.sync_loss_source) finishes 100k and its supervisor exits, this
# script finishes the single-lever attribution campaign (VERDICT r4 ask #2)
# and measures the round-5 step-time levers on the then-quiet chip
# (VERDICT r4 ask #4).
#
# Usage: tools/post_ctrl.sh <supervisor_pid>
set -u
cd "$(dirname "$0")/.."
SUP_PID=${1:?supervisor pid}

echo "[post] waiting for supervisor $SUP_PID to exit"
while kill -0 "$SUP_PID" 2>/dev/null; do sleep 20; done
echo "[post] chip free at $(date -u +%H:%M:%S)"
rm -rf runs/specificity5/checkpoints/*.orbax-checkpoint-tmp

mkdir -p docs/specificity5
cp runs/specificity5/logs/metrics.jsonl docs/specificity5/metrics.jsonl
git add docs/specificity5/metrics.jsonl \
  && git commit -q -m "specificity5 control: training metrics through 100k" || true

echo "[post] control milestone sweep (n=16, speaker-balanced)"
bash tools/spec_eval_sweep.sh runs/specificity5 16 50000 62500 75000 87500

echo "[post] control pinned-bar eval at 100k (n=64, docs/SPEC_BAR.md)"
bash tools/spec_eval_sweep.sh runs/specificity5 64 100000

echo "[post] single-lever attribution table (v7 vs control, matched steps)"
python tools/spec_compare.py docs/specificity7 docs/specificity5 \
  --labels "v7(cap+mouthsync)" "ctrl(cap-only)" \
  --steps 25000 50000 75000 100000 \
  | tee docs/spec_attribution_r5.md
git add docs/spec_attribution_r5.md \
  && git commit -q -m "attribution: v7 vs capacity-only control at matched steps (r5 table)" || true

echo "[post] step-time lever table (VERDICT r4 ask #4) on the quiet chip"
{ echo "flagship config (levers off):"
  python bench.py --task train \
    --config configs/mvp.yaml configs/specificity7.yaml 2>/dev/null | tail -1
  echo "flagship + fastopt (mv_dtype bf16 + recon_every 8):"
  python bench.py --task train \
    --config configs/mvp.yaml configs/specificity7.yaml configs/fastopt.yaml \
    2>/dev/null | tail -1
} | tee docs/levers_r5.txt
git add docs/levers_r5.txt \
  && git commit -q -m "measured step-time lever table: mv_dtype bf16 + recon_every (flagship config)" || true

echo "[post] done at $(date -u +%H:%M:%S)"
