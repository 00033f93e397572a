#!/bin/bash
# Round-5 timing experiment: sync-GUIDED sampling (infer/ddim.py
# sync_guidance_scale — ROADMAP r5 #3, the pre-declared inference-side
# lever) evaluated against the pinned bar metric on the two trained 100k
# checkpoints:
#
#   ctrl  (runs/specificity5, video-source sync head trained)  x src=video
#   ctrl                                                        x src=mouth
#   v7    (runs/specificity7, mouth-source sync head trained)   x src=mouth
#
# Stage 1: the three (model, source) arms at scale 2, n=16.
# Stage 2: scale sweep {1, 4} on the best arm by gap_mouth0_gen.
# Stage 3: n=64 pinned-bar eval (docs/SPEC_BAR.md protocol) on the winner.
#
# Holds ONE chip claim across the whole sweep; artifacts commit to
# docs/sync_guide_r5/ as they land (host resets cannot erase evidence).
set -u
cd "$(dirname "$0")/.."
if [ -z "${MMDIFF_SWEEP_WRAPPED:-}" ]; then
  export MMDIFF_SWEEP_WRAPPED=1
  exec python -m multimodal_diffusion_tpu.utils.chip_claim \
      --tag sync-guide --queue-timeout 14400 -- bash "$0" "$@"
fi
mkdir -p docs/sync_guide_r5 runs/sync_guide
# persistent XLA cache: the guided sampler's scan body (fwd+bwd through the
# denoiser) is a long remote compile; n=64 reuses the winning n=16 program
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/mmdiff_jax_cache}"

eval_one () {  # model(ctrl|v7) source scale n
  local model=$1 src=$2 scale=$3 n=$4
  local out="docs/sync_guide_r5/eval_${model}_${src}_s${scale}_n${n}.json"
  [ -f "$out" ] && { echo "[guide] skip $model/$src/s$scale/n$n (done)"; return; }
  local cfgs ck
  if [ "$model" = v7 ]; then
    cfgs="configs/specificity7.yaml configs/specificity7_eval.yaml"
    ck="runs/specificity7/checkpoints/100000"
  else
    cfgs="configs/specificity5.yaml configs/specificity5_eval.yaml"
    ck="runs/specificity5/checkpoints/100000"
  fi
  local ov="runs/sync_guide/.ov_${model}_${src}_${scale}.yaml"
  printf 'paths:\n  ckpt_path: "%s"\nsampling:\n  sync_guidance_scale: %s\n  sync_guidance_source: "%s"\n' \
    "$ck" "$scale" "$src" > "$ov"
  echo "[guide] $model src=$src scale=$scale n=$n"
  timeout 7200 python tools/eval_av_quality.py \
    --config configs/mvp.yaml $cfgs "$ov" \
    --n "$n" --ema --seed 0 --spread --out "$out" \
    2>"runs/sync_guide/err_${model}_${src}_s${scale}_n${n}.log" | tail -2
  if [ -f "$out" ]; then
    git add "$out" && git commit -q -m "sync-guide eval: $model src=$src scale=$scale n=$n" || true
  else
    echo "[guide] $model/$src/s$scale FAILED"
  fi
}

# Stage 0: n=2 smoke — fail fast (and cheap) if the guided program
# misbehaves on the real checkpoint before committing hours to n=16 arms
eval_one ctrl video 2 2

# Stage 1: three arms at scale 2
eval_one ctrl video 2 16
eval_one ctrl mouth 2 16
eval_one v7   mouth 2 16

# Stage 2+3: pick the best arm, sweep its scale, confirm at n=64
best=$(python - <<'PY'
import json, glob
best, bv = None, -1e9
for p in glob.glob("docs/sync_guide_r5/eval_*_s2_n16.json"):
    try:
        m = json.load(open(p))["mean"]
    except Exception:
        continue
    # primary bar metric: mouth-crop zero-lag gap of generated audio
    v = m.get("gap_mouth0_gen", -1e9)
    parts = p.split("/")[-1].split("_")
    if v > bv:
        bv, best = v, f"{parts[1]} {parts[2]}"
print(best or "ctrl video")
PY
)
set -- $best
bm=$1; bs=$2
echo "[guide] best arm: model=$bm source=$bs"
eval_one "$bm" "$bs" 1 16
eval_one "$bm" "$bs" 4 16

best_scale=$(python - "$bm" "$bs" <<'PY'
import json, sys, glob
bm, bs = sys.argv[1], sys.argv[2]
best, bv = "2", -1e9
for s in ("1", "2", "4"):
    try:
        m = json.load(open(f"docs/sync_guide_r5/eval_{bm}_{bs}_s{s}_n16.json"))["mean"]
    except Exception:
        continue
    v = m.get("gap_mouth0_gen", -1e9)
    if v > bv:
        bv, best = v, s
print(best)
PY
)
echo "[guide] best scale: $best_scale — n=64 pinned-bar eval"
eval_one "$bm" "$bs" "$best_scale" 64
echo "[guide] done"
