#!/bin/bash
# Watch a specificity run's checkpoint dir for new steps; run a small
# held-out specificity eval (CPU backend, n=8) per new checkpoint and store
# <run_dir>/eval_<step>.json — then COMMIT it to docs/<run>/ (a host reset
# must never erase a campaign's results again, VERDICT r3 #3).  Cheap
# in-round evidence of corr_gen - corr_shuf separation while a 100k-step
# run is in flight.
#
# Usage: tools/watch_spec_eval.sh [run_dir] [overlay.yaml ...]
#   defaults: runs/specificity3 with the v3 config + its eval overlay
cd "$(dirname "$0")/.."
OUT=${1:-runs/specificity3}
shift || true
if [ $# -gt 0 ]; then CFGS=("$@"); else
  CFGS=(configs/specificity3.yaml configs/specificity3_eval.yaml)
fi
DIR="$OUT/checkpoints"
while true; do
  for d in "$DIR"/*/; do
    step=$(basename "$d")
    [[ "$step" =~ ^[0-9]+$ ]] || continue
    out="$OUT/eval_${step}.json"
    [[ -f "$out" ]] && continue
    if [[ -f "$out.running" ]]; then
      # a sentinel left behind by a killed watcher / host reset would skip
      # this checkpoint forever; reclaim it once it outlives any real eval
      if [[ -z "$(find "$out.running" -mmin +150 2>/dev/null)" ]]; then
        continue
      fi
      echo "[watch_spec_eval] reclaiming stale sentinel for step $step"
      rm -f "$out.running"
    fi
    touch "$out.running"
    trap 'rm -f "$out.running"' EXIT INT TERM
    echo "[watch_spec_eval] $(date -u +%H:%M:%S) evaluating step $step"
    ov="$OUT/.eval_${step}.yaml"
    printf 'paths:\n  ckpt_path: "%s/%s"\n' "$DIR" "$step" > "$ov"
    timeout 7200 python tools/eval_av_quality.py \
      --config configs/mvp.yaml "${CFGS[@]}" "$ov" \
      --n 8 --ema --seed 0 --device cpu \
      --out "$out" >> "$OUT/eval_watch.log" 2>&1 \
      && python - "$out" <<'PY'
import json, sys
d = json.load(open(sys.argv[1]))["mean"]
sep = d["av_sync_corr_gen"] - d["av_sync_corr_shuf"]
cs = d.get("cond_sensitivity_logmel")
r1 = d.get("retrieval_top1")
ge, gl = d.get("gap_env"), d.get("gap_logmel")
print(f"[watch_spec_eval] {sys.argv[1]}: corr_gen={d['av_sync_corr_gen']:.3f} "
      f"corr_shuf={d['av_sync_corr_shuf']:.3f} sep={sep:+.3f} "
      f"logmel_l1={d['logmel_l1']:.3f}"
      + (f" gap_logmel={gl:+.3f}" if gl is not None else "")
      + (f" gap_env={ge:+.3f}" if ge is not None else "")
      + (f" cond_sens={cs:.3f}" if cs is not None else "")
      + (f" retrieval@1={r1:.2f}" if r1 is not None else ""))
PY
    if [ -f "$out" ]; then
      dd="docs/$(basename "$OUT")"
      mkdir -p "$dd" && cp "$out" "$dd/" \
        && git add "$dd/$(basename "$out")" \
        && git commit -q -m "$(basename "$OUT") watcher eval artifact: step $step" \
        || echo "[watch_spec_eval] WARNING: could not commit $out"
    fi
    rm -f "$out.running"
  done
  sleep 120
done
