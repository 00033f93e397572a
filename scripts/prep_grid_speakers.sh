#!/bin/bash
# Round-3 data prep: extract frames + speech audio for GRID speakers s2-s4
# (s1 was prepared in round 2).  Per-speaker output dirs because GRID
# filenames repeat across speakers (each speaker utters the same 1000
# sentence codes).
set -e
cd /root/repo
RAW=/root/reference/data/video/GRID/raw
for S in s2 s3 s4; do
  echo "=== $S frames ==="
  python scripts/extract_frames.py --input $RAW/$S/$S \
      --output data/video/frames_$S --fps 16 --size 128 --clip-seconds 3.0
  echo "=== $S audio ==="
  python scripts/preprocess_audio.py --mode wav --input $RAW/$S/$S \
      --output data/audio/wav16k/$S --sr 16000
done
echo "=== prep done ==="
