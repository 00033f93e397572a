#!/bin/bash
# Final sync-guidance round: pick the best arm across ALL n=16 probes by
# the pre-registered primary metric (gap_mouth0_gen), subject to content
# preservation (gap_logmel > +0.1 — the round-3 content bar), and run the
# n=64 pinned-bar eval (docs/SPEC_BAR.md protocol) on it.
set -u
cd "$(dirname "$0")/.."
GATED_LOG=${1:-/tmp/sync_guide_gated.log}
if [ -z "${MMDIFF_SWEEP_WRAPPED:-}" ]; then
  while ! grep -q "\[guide-gated\] done" "$GATED_LOG" 2>/dev/null; do sleep 30; done
  export MMDIFF_SWEEP_WRAPPED=1
  exec python -m multimodal_diffusion_tpu.utils.chip_claim \
      --tag sync-guide-final --queue-timeout 7200 -- bash "$0" "$@"
fi
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/mmdiff_jax_cache}"

best=$(python - <<'PY'
import json, glob, re
best, bv = None, -1e9
for p in glob.glob("docs/sync_guide_r5/eval_v7_mouth_*_n16.json"):
    try:
        m = json.load(open(p))["mean"]
    except Exception:
        continue
    if m.get("gap_logmel", -1) <= 0.1:
        continue  # content bar: guided audio must stay content-specific
    v = m.get("gap_mouth0_gen", -1e9)
    if v > bv:
        bv, best = v, p
print(best or "")
PY
)
[ -z "$best" ] && { echo "[guide-final] no arm passed the content bar"; exit 0; }
echo "[guide-final] best arm: $best"
# reconstruct the overlay from the filename: eval_v7_mouth_<arm>_n16.json
arm=$(basename "$best" | sed 's/^eval_v7_mouth_//; s/_n16\.json$//')
ov="runs/sync_guide/.ov_final.yaml"
case "$arm" in
  raw_s*)
    scale=${arm#raw_s}
    printf 'paths:\n  ckpt_path: "runs/specificity7/checkpoints/100000"\nsampling:\n  sync_guidance_scale: %s\n  sync_guidance_source: "mouth"\n  sync_guidance_norm: "raw"\n' "$scale" > "$ov" ;;
  s*_gate*)
    scale=$(echo "$arm" | sed 's/^s//; s/_gate.*//')
    gate=${arm#*gate}
    printf 'paths:\n  ckpt_path: "runs/specificity7/checkpoints/100000"\nsampling:\n  sync_guidance_scale: %s\n  sync_guidance_source: "mouth"\n  sync_guidance_min_abar: %s\n' "$scale" "$gate" > "$ov" ;;
  s*)
    scale=${arm#s}
    printf 'paths:\n  ckpt_path: "runs/specificity7/checkpoints/100000"\nsampling:\n  sync_guidance_scale: %s\n  sync_guidance_source: "mouth"\n' "$scale" > "$ov" ;;
  *) echo "[guide-final] unrecognized arm $arm"; exit 1 ;;
esac
out="docs/sync_guide_r5/eval_v7_mouth_${arm}_n64.json"
if [ ! -f "$out" ]; then
  echo "[guide-final] n=64 pinned-bar eval of $arm"
  timeout 7200 python tools/eval_av_quality.py \
    --config configs/mvp.yaml configs/specificity7.yaml \
             configs/specificity7_eval.yaml "$ov" \
    --n 64 --ema --seed 0 --spread --out "$out" \
    2>"runs/sync_guide/err_final_${arm}_n64.log" | tail -2
  [ -f "$out" ] && git add "$out" \
    && git commit -q -m "sync-guide FINAL: $arm at n=64 (pinned-bar protocol)" \
    || echo "[guide-final] n=64 FAILED"
fi
echo "[guide-final] done"
