#!/bin/bash
# Continuation of tools/post_v7.sh (the original bash process was killed
# after its on-disk script was edited mid-run — bash streams scripts by
# byte offset, so the remainder could not be trusted).  Waits for the
# in-flight n=16 sweep, then runs the remaining post-v7 steps.
set -u
cd "$(dirname "$0")/.."
SWEEP_PID=${1:?pid of the running n=16 sweep (chip_claim wrapper)}

echo "[postb] waiting for the n=16 sweep (pid $SWEEP_PID)"
while kill -0 "$SWEEP_PID" 2>/dev/null; do sleep 20; done

echo "[postb] metrics snapshot"
mkdir -p docs/specificity7
cp runs/specificity7/logs/metrics.jsonl docs/specificity7/metrics.jsonl
git add docs/specificity7/metrics.jsonl \
  && git commit -q -m "specificity7: training metrics through 100k (loss curves)" || true

echo "[postb] pinned-bar eval at 100k (n=64, docs/SPEC_BAR.md)"
bash tools/spec_eval_sweep.sh runs/specificity7 64 100000

echo "[postb] flagship step decomposition (VERDICT r3 #4)"
python tools/step_decompose.py --out docs/step_decompose_v7.json \
  2>/tmp/step_decompose.err | tail -40

echo "[postb] quant measured table (VERDICT r3 #6)"
python -m multimodal_diffusion_tpu.utils.chip_claim --tag quant -- \
  python tools/quant_probe.py --out docs/quant_probe_r4.json 2>/dev/null | tail -20

echo "[postb] bench pairs (bf16 vs int8) on the quiet chip"
{ echo "t2i bf16:"; python bench.py --task t2i 2>/dev/null | tail -1
  echo "t2i int8:"; python bench.py --task t2i --quant int8 2>/dev/null | tail -1
  echo "av v2a bf16:"; python bench.py 2>/dev/null | tail -1
  echo "av v2a int8:"; python bench.py --quant int8 2>/dev/null | tail -1
  echo "av train step (v7 config):"
  python bench.py --task train --config configs/mvp.yaml configs/specificity7.yaml 2>/dev/null | tail -1
} | tee docs/bench_post_v7.txt

echo "[postb] int8 end-to-end AV quality delta at 100k (n=8 vs bf16 eval)"
ov8=runs/specificity7/.int8_100000.yaml
printf 'paths:\n  ckpt_path: "runs/specificity7/checkpoints/100000"\n' > "$ov8"
python -m multimodal_diffusion_tpu.utils.chip_claim --tag int8-eval -- \
  python tools/eval_av_quality.py \
    --config configs/mvp.yaml configs/specificity7.yaml configs/specificity7_eval.yaml configs/int8.yaml "$ov8" \
    --n 8 --ema --seed 0 --spread --out docs/specificity7/eval_int8_100000.json \
  2>/dev/null | tail -3

git add docs/ && git commit -q -m "post-v7 artifacts: decomposition, quant table, bench pairs, int8 eval" || true

echo "[postb] ours-side extended parity rerun (2000 steps)"
python -m multimodal_diffusion_tpu.utils.chip_claim --tag parity-ours -- \
  python -m multimodal_diffusion_tpu.train.train_joint \
    --config configs/parity_tiny.yaml configs/parity_tiny_ours2k.yaml \
  > /tmp/parity_ours2k.log 2>&1 \
  && { mkdir -p docs/parity_tiny_ours2k
       cp runs/parity_tiny_ours2k/logs/metrics.jsonl docs/parity_tiny_ours2k/
       git add docs/parity_tiny_ours2k && git commit -q -m "parity: ours-side 2000-step loss curve (post-reset rerun)" || true
     } || echo "[postb] WARNING: ours2k parity run failed (see /tmp/parity_ours2k.log)"

echo "[postb] launching capacity-only control (specificity5 config)"
mkdir -p runs/specificity5/logs
nohup python tools/supervise.py \
  --progress-file runs/specificity5/logs/metrics.jsonl \
  --startup-seconds 10800 --stall-seconds 1800 --grace-seconds 600 \
  --max-restarts 24 --backoff-seconds 60 -- \
  python -m multimodal_diffusion_tpu.train.train_joint \
    --config configs/mvp.yaml configs/specificity5.yaml configs/ckpt12500.yaml --resume \
  > runs/specificity5/logs/supervise_r4.log 2>&1 &
echo $! > /tmp/spec5.pid
echo "[postb] control supervisor pid $(cat /tmp/spec5.pid)"

nohup bash tools/watch_spec_eval.sh runs/specificity5 \
  configs/specificity5.yaml configs/specificity5_eval.yaml \
  > /tmp/watch_spec5.log 2>&1 &
echo $! > /tmp/watch5.pid
echo "[postb] control watcher pid $(cat /tmp/watch5.pid)"
echo "[postb] done"
