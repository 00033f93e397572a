#!/bin/bash
# Raw-norm sync-guidance arms (sync_guidance_norm: raw — gradient used
# as-is, so its magnitude gates the injection to informative steps).  Raw
# InfoNCE gradient scales are unknown a priori; probe two decades.
set -u
cd "$(dirname "$0")/.."
SMALL_LOG=${1:-/tmp/sync_guide_small.log}
if [ -z "${MMDIFF_SWEEP_WRAPPED:-}" ]; then
  while ! grep -q "\[guide-small\] done" "$SMALL_LOG" 2>/dev/null; do sleep 30; done
  export MMDIFF_SWEEP_WRAPPED=1
  exec python -m multimodal_diffusion_tpu.utils.chip_claim \
      --tag sync-guide-raw --queue-timeout 7200 -- bash "$0" "$@"
fi
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/mmdiff_jax_cache}"
mkdir -p docs/sync_guide_r5 runs/sync_guide

for scale in 1 20; do
  out="docs/sync_guide_r5/eval_v7_mouth_raw_s${scale}_n16.json"
  [ -f "$out" ] && continue
  ov="runs/sync_guide/.ov_v7_mouth_raw_${scale}.yaml"
  printf 'paths:\n  ckpt_path: "runs/specificity7/checkpoints/100000"\nsampling:\n  sync_guidance_scale: %s\n  sync_guidance_source: "mouth"\n  sync_guidance_norm: "raw"\n' \
    "$scale" > "$ov"
  echo "[guide-raw] v7 mouth raw s=$scale n=16"
  timeout 7200 python tools/eval_av_quality.py \
    --config configs/mvp.yaml configs/specificity7.yaml \
             configs/specificity7_eval.yaml "$ov" \
    --n 16 --ema --seed 0 --spread --out "$out" \
    2>"runs/sync_guide/err_v7_mouth_raw_s${scale}_n16.log" | tail -2
  [ -f "$out" ] && git add "$out" \
    && git commit -q -m "sync-guide eval: v7 mouth norm=raw scale=$scale n=16" \
    || echo "[guide-raw] s=$scale FAILED"
done
echo "[guide-raw] done"
