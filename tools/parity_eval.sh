#!/bin/bash
# Matched-milestone quality parity: port the PyTorch reference checkpoint,
# then score BOTH frameworks' checkpoints with the identical sampler + eval
# harness on the identical held-out clips (CPU backend both sides, as in
# round 3 — no chip needed, safe alongside a live campaign).
#
# Usage: tools/parity_eval.sh <step> [n]
#   needs runs/parity_tiny_ref/checkpoints/step_<step>.pt  (reference side)
#     and runs/parity_tiny_ours2k/checkpoints/<step>       (our side)
# Writes docs/parity/eval_{ref,ours}_<step>.json and commits them.
set -eu
cd "$(dirname "$0")/.."
STEP=${1:?step}
N=${2:-16}

REF_PT="runs/parity_tiny_ref/checkpoints/step_${STEP}.pt"
OURS_CK="runs/parity_tiny_ours2k/checkpoints/${STEP}"
[ -f "$REF_PT" ] || { echo "missing $REF_PT"; exit 1; }
[ -d "$OURS_CK" ] || { echo "missing $OURS_CK"; exit 1; }

mkdir -p docs/parity runs/ported
if [ ! -d "runs/ported/${STEP}" ]; then
  python tools/port_reference_checkpoint.py \
    --ckpt "$REF_PT" --config configs/parity_tiny.yaml \
    --out "runs/ported/${STEP}"
fi

ov_val=runs/ported/.val_manifest.yaml
printf 'data:\n  train_split_glob: "data/GRID/clips_val.json"\n' > "$ov_val"

for side in ref ours; do
  out="docs/parity/eval_${side}_${STEP}.json"
  [ -f "$out" ] && { echo "[parity] skip $side@$STEP (done)"; continue; }
  # the port tool writes <out>/<step>/ (manager dir containing one step
  # dir); the eval expects the STEP dir itself, as the sweep passes it
  ck="runs/ported/${STEP}/${STEP}"; [ "$side" = ours ] && ck="$OURS_CK"
  ov=runs/ported/.ck_${side}_${STEP}.yaml
  printf 'paths:\n  ckpt_path: "%s"\n' "$ck" > "$ov"
  echo "[parity] eval $side @ $STEP (n=$N, cpu)"
  python tools/eval_av_quality.py \
    --config configs/parity_tiny.yaml "$ov_val" "$ov" \
    --n "$N" --ema --seed 0 --device cpu --out "$out" 2>/dev/null | tail -2
done

git add docs/parity && git commit -q -m "parity milestone $STEP: ref-vs-ours held-out evals (one harness, CPU both sides)" || true

python - "$STEP" <<'PY'
import json, sys
s = sys.argv[1]
for side in ("ref", "ours"):
    m = json.load(open(f"docs/parity/eval_{side}_{s}.json"))["mean"]
    print(f"step {s} {side:>4}: "
          f"sync gen/shuf {m['av_sync_corr_gen']:+.3f}/{m['av_sync_corr_shuf']:+.3f}  "
          f"logmel gen/shuf {m['logmel_l1']:.2f}/{m['logmel_l1_shuf']:.2f}  "
          f"spec_conv {m['spec_convergence']:.2f}")
PY
