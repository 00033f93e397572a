#!/bin/bash
# Milestone eval sweep for a specificity run — on the TPU.  The script
# CLAIMS the chip first (utils/chip_claim.py): a live supervised training
# run checkpoints, yields, and resumes automatically when the sweep ends,
# so it is safe to run mid-campaign.  Produces <run_dir>/evalN_<step>.json
# per milestone with the full metric set (incl. retrieval_top1 and the
# cond-sensitivity probe), and COMMITS each result to docs/<run>/ so a
# host reset can never erase a campaign's evidence again (VERDICT r3 #3).
#
# Usage: tools/spec_eval_sweep.sh [run_dir] [n] [step ...] [-- overlay.yaml ...]
#   defaults: runs/specificity3, n=16, every 25k milestone + 5k,
#             overlays inferred from the run dir name
#             (runs/specificityK -> configs/specificityK.yaml + its _eval).
cd "$(dirname "$0")/.."
if [ -z "${MMDIFF_SWEEP_WRAPPED:-}" ]; then
  export MMDIFF_SWEEP_WRAPPED=1
  exec python -m multimodal_diffusion_tpu.utils.chip_claim \
      --tag spec-sweep -- bash "$0" "$@"
fi
OUT=${1:-runs/specificity3}
N=${2:-16}
shift 2 2>/dev/null || shift $# 2>/dev/null
STEPS=()
CFGS=()
mode=steps
for a in "$@"; do
  if [ "$a" = "--" ]; then mode=cfgs; continue; fi
  if [ "$mode" = steps ]; then STEPS+=("$a"); else CFGS+=("$a"); fi
done
[ ${#STEPS[@]} -eq 0 ] && STEPS=(5000 25000 50000 75000 100000)
if [ ${#CFGS[@]} -eq 0 ]; then
  name=$(basename "$OUT")
  CFGS=("configs/${name#av_}.yaml" "configs/${name#av_}_eval.yaml")
fi
for step in "${STEPS[@]}"; do
  d="$OUT/checkpoints/$step"
  [ -d "$d" ] || { echo "[sweep] skip $step (no checkpoint)"; continue; }
  out="$OUT/evalN_${step}.json"
  [ -f "$out" ] && { echo "[sweep] skip $step (done)"; continue; }
  ov="$OUT/.evalN_${step}.yaml"
  printf 'paths:\n  ckpt_path: "%s"\n' "$d" > "$ov"
  echo "[sweep] step $step (n=$N)"
  # SPREAD=0 disables speaker-balanced sampling (default on: the tail slice
  # of a speaker-ordered manifest silently covers a speaker subset, and both
  # the sync-instrument ceiling and the model's specificity are strongly
  # speaker-dependent — PERFORMANCE.md "Specificity v4")
  EXTRA=(--spread); [ "${SPREAD:-1}" = 0 ] && EXTRA=()
  timeout 3600 python tools/eval_av_quality.py \
    --config configs/mvp.yaml "${CFGS[@]}" "$ov" \
    --n "$N" --ema --seed 0 "${EXTRA[@]}" --out "$out" || echo "[sweep] step $step FAILED"
  # durable evidence: runs/ does not survive host resets; docs/ is in git
  if [ -f "$out" ]; then
    dd="docs/$(basename "$OUT")"
    mkdir -p "$dd" && cp "$out" "$dd/" \
      && git add "$dd/$(basename "$out")" \
      && git commit -q -m "$(basename "$OUT") milestone eval artifact: step $step (n=$N)" \
      || echo "[sweep] WARNING: could not commit $out to $dd"
  fi
done
python - "$OUT" <<'PY'
import json, sys
from pathlib import Path
rows = sorted(Path(sys.argv[1]).glob("evalN_*.json"),
              key=lambda p: int(p.stem.split("_")[1]))
for p in rows:
    d = json.load(open(p))["mean"]
    nan = float("nan")
    mg, mgt = d.get("gap_mouth0_gen", nan), d.get("gap_mouth0_gen_t", nan)
    mr = d.get("gap_mouth0_real", nan)
    fg = d.get("gap0_gen", nan)
    print(f"step {p.stem.split('_')[1]:>6}: "
          f"mouth0_gap_gen={mg:+.3f} (t={mgt:+.1f}; real anchor {mr:+.3f})  "
          f"full0_gap_gen={fg:+.3f}  "
          f"env_gap={d.get('gap_env', nan):+.3f} "
          f"(t={d.get('gap_env_t', nan):+.1f}; "
          f"corr {d.get('env_corr_gen', nan):+.3f} "
          f"vs shuf-floor {d.get('env_corr_real_shuf', nan):+.3f})  "
          f"logmel={d['logmel_l1']:.3f} "
          f"(gap {d.get('gap_logmel', nan):+.3f}, t={d.get('gap_logmel_t', nan):+.1f})  "
          f"retrieval@1={d.get('retrieval_top1', nan):.2f} "
          f"(env {d.get('env_retrieval_top1', nan):.2f})  "
          f"cond_sens={d.get('cond_sensitivity_logmel', nan):.3f}")
PY
