#!/bin/bash
# Follow-up to tools/sync_guide_sweep.sh: the s in {1,2,4} arms showed a
# scale-INSENSITIVE content cost (gap_logmel ~ -0.43 at every scale) —
# the per-sample RMS normalization injects an eps-sized perturbation even
# where the sync gradient is uninformative, so any s >= 1 wrecks content
# while the timing nudge rides on top.  Probe the small-scale regime where
# the injection is a fraction of the eps update.
#
# Usage: tools/sync_guide_smallscale.sh [guide_log]  (waits for the main
# sweep to finish, then claims the chip once for both arms)
set -u
cd "$(dirname "$0")/.."
GUIDE_LOG=${1:-/tmp/sync_guide.log}
if [ -z "${MMDIFF_SWEEP_WRAPPED:-}" ]; then
  while ! grep -q "\[guide\] done" "$GUIDE_LOG" 2>/dev/null; do sleep 30; done
  export MMDIFF_SWEEP_WRAPPED=1
  exec python -m multimodal_diffusion_tpu.utils.chip_claim \
      --tag sync-guide-small --queue-timeout 7200 -- bash "$0" "$@"
fi
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/mmdiff_jax_cache}"
mkdir -p docs/sync_guide_r5 runs/sync_guide

for scale in 0.5 0.25; do
  out="docs/sync_guide_r5/eval_v7_mouth_s${scale}_n16.json"
  [ -f "$out" ] && continue
  ov="runs/sync_guide/.ov_v7_mouth_${scale}.yaml"
  printf 'paths:\n  ckpt_path: "runs/specificity7/checkpoints/100000"\nsampling:\n  sync_guidance_scale: %s\n  sync_guidance_source: "mouth"\n' \
    "$scale" > "$ov"
  echo "[guide-small] v7 mouth s=$scale n=16"
  timeout 7200 python tools/eval_av_quality.py \
    --config configs/mvp.yaml configs/specificity7.yaml \
             configs/specificity7_eval.yaml "$ov" \
    --n 16 --ema --seed 0 --spread --out "$out" \
    2>"runs/sync_guide/err_v7_mouth_s${scale}_n16.log" | tail -2
  [ -f "$out" ] && git add "$out" \
    && git commit -q -m "sync-guide eval: v7 mouth scale=$scale n=16" \
    || echo "[guide-small] s=$scale FAILED"
done
echo "[guide-small] done"
