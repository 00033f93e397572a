#!/bin/bash
# Round-5 stretch (VERDICT r4 #7): one compounded serving row — DPM++(2M)
# @ 12 steps + int8 W8A8 on the t2i pipeline — after tools/post_ctrl.sh
# frees the chip.  Waits for the post-control log to finish first.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/post_ctrl.log}

echo "[serving] waiting for post_ctrl to finish"
while ! grep -q "\[post\] done" "$LOG" 2>/dev/null; do sleep 30; done

{ echo "t2i serving row (dpmpp_2m @ 12 steps + int8, b8):"
  python bench.py --task t2i --serving 2>/dev/null | tail -1
  echo "t2i bf16 ddim@50 reference row (same minute):"
  python bench.py --task t2i 2>/dev/null | tail -1
} | tee docs/serving_row_r5.txt
git add docs/serving_row_r5.txt \
  && git commit -q -m "serving row: t2i dpmpp_2m@12 + int8 vs ddim@50 bf16 (same-minute pair)" || true
echo "[serving] done"
