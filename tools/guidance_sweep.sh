#!/bin/bash
# CFG-guidance sweep on a finished specificity checkpoint — on the TPU.
# Specificity levers don't end at training: guidance strength directly
# scales how hard the sampler leans on the video conditioning, so the
# envelope-alignment readout can move materially with g at a fixed
# checkpoint.  Writes <run_dir>/evalG<g>_<step>.json per guidance value.
#
# Usage: tools/guidance_sweep.sh [run_dir] [step] [n] [g ...]
#   defaults: runs/specificity4, 100000, 16, g in 2.0 3.5 5.0 7.0
cd "$(dirname "$0")/.."
OUT=${1:-runs/specificity4}
STEP=${2:-100000}
N=${3:-16}
shift 3 2>/dev/null || shift $# 2>/dev/null
GS=("$@")
[ ${#GS[@]} -eq 0 ] && GS=(2.0 3.5 5.0 7.0)
name=$(basename "$OUT")
CFGS=("configs/${name#av_}.yaml" "configs/${name#av_}_eval.yaml")
d="$OUT/checkpoints/$STEP"
[ -d "$d" ] || { echo "[gsweep] no checkpoint at $d"; exit 1; }
for g in "${GS[@]}"; do
  out="$OUT/evalG${g}_${STEP}.json"
  [ -f "$out" ] && { echo "[gsweep] skip g=$g (done)"; continue; }
  ov="$OUT/.evalG${g}_${STEP}.yaml"
  printf 'paths:\n  ckpt_path: "%s"\nsampling:\n  guidance_scale:\n    video: %s\n    audio: %s\n' \
      "$d" "$g" "$g" > "$ov"
  echo "[gsweep] g=$g (n=$N, step $STEP)"
  # speaker-balanced by default, like spec_eval_sweep.sh (SPREAD=0 opts out)
  EXTRA=(--spread); [ "${SPREAD:-1}" = 0 ] && EXTRA=()
  timeout 3600 python tools/eval_av_quality.py \
    --config configs/mvp.yaml "${CFGS[@]}" "$ov" \
    --n "$N" --ema --seed 0 "${EXTRA[@]}" --out "$out" || echo "[gsweep] g=$g FAILED"
done
python - "$OUT" "$STEP" <<'PY'
import json, sys
from pathlib import Path
out, step = sys.argv[1], sys.argv[2]
rows = sorted(Path(out).glob(f"evalG*_{step}.json"),
              key=lambda p: float(p.stem.split("_")[0][5:]))
nan = float("nan")
for p in rows:
    d = json.load(open(p))["mean"]
    g = p.stem.split("_")[0][5:]
    print(f"g={g:>4}: mouth0_gap_gen={d.get('gap_mouth0_gen', nan):+.3f} "
          f"(t={d.get('gap_mouth0_gen_t', nan):+.1f})  "
          f"full0_gap_gen={d.get('gap0_gen', nan):+.3f}  "
          f"env_gap={d.get('gap_env', nan):+.3f} "
          f"(t={d.get('gap_env_t', nan):+.1f})  "
          f"logmel={d['logmel_l1']:.3f} "
          f"(gap {d.get('gap_logmel', nan):+.3f})  "
          f"retrieval@1={d.get('retrieval_top1', nan):.2f}  "
          f"cond_sens={d.get('cond_sensitivity_logmel', nan):.3f}")
PY
