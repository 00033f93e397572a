#!/bin/bash
# Full GRID data prep from the raw reference corpus (s1-s4), reproducing the
# round-2/3 on-disk layout from scratch.  Idempotent per stage via `.done`
# sentinel files (NOT dir renames: extract_frames records the output dir
# inside each per-video clips.json, so renaming the dir afterwards breaks
# every recorded path).
#
# Layout produced (see tools/build_multispeaker_manifest.py SPEAKERS):
#   data/video/frames        s1 train videos (968) — physical split
#   data/video/frames_val    s1 val videos (sorted positions 400-431)
#   data/video/frames_s{2,3,4}  full 1000 videos each (positional split)
#   data/audio/wav16k/s{1..4}/<stem>.wav
#   data/GRID/clips_4spk{,_val}.json
#   data/records_4spk/       pre-decoded .avrec shards
set -e
cd /root/repo
RAW=/root/reference/data/video/GRID/raw

for S in s1 s2 s3 s4; do
  if [ "$S" = s1 ]; then FR=data/video/frames; else FR=data/video/frames_$S; fi
  if [ ! -f "$FR/.done" ]; then
    echo "=== $S frames -> $FR ==="
    python scripts/extract_frames.py --input $RAW/$S/$S \
        --output $FR --fps 16 --size 128 --clip-seconds 3.0
    touch $FR/.done
  fi
  if [ ! -f "data/audio/wav16k/$S/.done" ]; then
    echo "=== $S audio ==="
    python scripts/preprocess_audio.py --mode wav --input $RAW/$S/$S \
        --output data/audio/wav16k/$S --sr 16000
    touch data/audio/wav16k/$S/.done
  fi
done

# s1 physical val split: sorted video dirs at 0-based positions 400-431.
# Moving a video dir is safe (clips.json paths are relative to the repo
# root) as long as the recorded paths are re-rooted onto the new dir.
if [ ! -d data/video/frames_val ]; then
  echo "=== s1 val split ==="
  python - <<'PY'
import json
import shutil
from pathlib import Path

src = Path("data/video/frames")
dst = Path("data/video/frames_val")
vids = sorted(p for p in src.iterdir() if (p / "clips.json").exists())
assert len(vids) >= 432, f"only {len(vids)} s1 videos extracted"
dst.mkdir(parents=True, exist_ok=True)
for v in vids[400:432]:
    tgt = dst / v.name
    shutil.move(str(v), str(tgt))
    mf = tgt / "clips.json"
    d = json.loads(mf.read_text())
    for c in d["clips"]:
        parts = Path(c["video_frames_dir"]).parts
        c["video_frames_dir"] = str(Path("data/video/frames_val", *parts[3:]))
    mf.write_text(json.dumps(d, indent=2))
print(f"moved 32 val videos; {sum(1 for _ in src.iterdir())} train entries remain")
PY
fi

echo "=== manifests ==="
python tools/build_multispeaker_manifest.py \
    --out-train data/GRID/clips_4spk.json \
    --out-val data/GRID/clips_4spk_val.json

if [ ! -f data/records_4spk/.done ]; then
  echo "=== records ==="
  python tools/build_records.py \
      --config configs/mvp.yaml configs/specificity2.yaml \
      --out data/records_4spk
  touch data/records_4spk/.done
fi
echo "=== prep_grid_all done ==="
