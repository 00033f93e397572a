#!/bin/bash
# Late-step-gated sync-guidance arm: sampling.sync_guidance_min_abar
# restricts the score injection to steps where the audio has formed —
# the fix for the measured scale-insensitive content cost (the x0-space
# conversion k ~ 1/sqrt(abar) explodes at early steps and any normalized
# injection there randomizes the trajectory start; docs/sync_guide_r5/).
set -u
cd "$(dirname "$0")/.."
RAW_LOG=${1:-/tmp/sync_guide_raw.log}
if [ -z "${MMDIFF_SWEEP_WRAPPED:-}" ]; then
  while ! grep -q "\[guide-raw\] done" "$RAW_LOG" 2>/dev/null; do sleep 30; done
  export MMDIFF_SWEEP_WRAPPED=1
  exec python -m multimodal_diffusion_tpu.utils.chip_claim \
      --tag sync-guide-gated --queue-timeout 7200 -- bash "$0" "$@"
fi
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/mmdiff_jax_cache}"
mkdir -p docs/sync_guide_r5 runs/sync_guide

for gate in 0.5 0.2; do
  out="docs/sync_guide_r5/eval_v7_mouth_s2_gate${gate}_n16.json"
  [ -f "$out" ] && continue
  ov="runs/sync_guide/.ov_v7_mouth_gate_${gate}.yaml"
  printf 'paths:\n  ckpt_path: "runs/specificity7/checkpoints/100000"\nsampling:\n  sync_guidance_scale: 2\n  sync_guidance_source: "mouth"\n  sync_guidance_min_abar: %s\n' \
    "$gate" > "$ov"
  echo "[guide-gated] v7 mouth s=2 min_abar=$gate n=16"
  timeout 7200 python tools/eval_av_quality.py \
    --config configs/mvp.yaml configs/specificity7.yaml \
             configs/specificity7_eval.yaml "$ov" \
    --n 16 --ema --seed 0 --spread --out "$out" \
    2>"runs/sync_guide/err_v7_mouth_gate${gate}_n16.log" | tail -2
  [ -f "$out" ] && git add "$out" \
    && git commit -q -m "sync-guide eval: v7 mouth s=2 min_abar=$gate n=16" \
    || echo "[guide-gated] gate=$gate FAILED"
done
echo "[guide-gated] done"
