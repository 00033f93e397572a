#!/usr/bin/env python3
"""Extract matched-step loss curves for the extended parity experiment.

Reads the PyTorch reference trainer's TensorBoard events
(runs/parity_tiny_ref/logs) and this framework's metrics.jsonl
(runs/parity_tiny_ours2k/logs), aligns both on step, and prints/writes a
table of pointwise AND window-averaged eps-loss at shared milestones.

VERDICT r2 weak #5 asked for like-for-like loss reporting: the reference
logs `train/loss_main` pointwise every `log_every` steps
(reference trainer.py:390-394) while our metrics.jsonl `loss` is also
pointwise per logged step — to kill residual single-batch noise both sides
additionally get a trailing-window mean (same window, same estimator).

Usage: python tools/parity_curves.py [--window 50] [--out report.json]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load_ref_scalars(logdir: Path, tag: str = "train/loss_main"):
    """step -> value from every tfevents file under logdir (later files
    override earlier on step collisions, matching a resume)."""
    from tensorboard.backend.event_processing import event_file_loader

    points = {}
    for f in sorted(logdir.glob("events.out.tfevents.*")):
        for ev in event_file_loader.LegacyEventFileLoader(str(f)).Load():
            for v in getattr(ev, "summary", ()).value:
                if v.tag == tag:
                    points[int(ev.step)] = float(v.simple_value)
    return dict(sorted(points.items()))


def load_ours_scalars(metrics_jsonl: Path, key: str = "loss_main"):
    points = {}
    with open(metrics_jsonl) as f:
        for line in f:
            m = json.loads(line)
            if key in m:
                points[int(m["step"])] = float(m[key])
    return dict(sorted(points.items()))


def window_mean(points: dict, step: int, window: int):
    vals = [v for s, v in points.items() if step - window < s <= step]
    return (sum(vals) / len(vals)) if vals else None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-logs", type=Path,
                    default=REPO / "runs/parity_tiny_ref/logs")
    ap.add_argument("--ours-metrics", type=Path,
                    default=REPO / "runs/parity_tiny_ours2k/logs/metrics.jsonl")
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--milestones", type=int, nargs="+", default=None)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args(argv)

    ref = load_ref_scalars(args.ref_logs)
    ours = load_ours_scalars(args.ours_metrics)
    if not ref or not ours:
        raise SystemExit(f"no data: ref={len(ref)} pts, ours={len(ours)} pts")

    last_shared = min(max(ref), max(ours))
    miles = args.milestones or [
        m for m in (50, 100, 250, 500, 750, 1000, 1250, 1500, 1750, 2000)
        if m <= last_shared
    ]
    rows = []
    for m in miles:
        rows.append({
            "step": m,
            "ref_loss": ref.get(m),
            "ref_loss_w": window_mean(ref, m, args.window),
            "ours_loss": ours.get(m),
            "ours_loss_w": window_mean(ours, m, args.window),
        })
    report = {
        "window": args.window,
        "ref_last_step": max(ref),
        "ours_last_step": max(ours),
        "rows": rows,
    }
    hdr = (f"{'step':>6} {'ref':>9} {'ref w' + str(args.window):>9} "
           f"{'ours':>9} {'ours w' + str(args.window):>9}")
    print(hdr)
    for r in rows:
        def fmt(x):
            return f"{x:9.4f}" if x is not None else "        -"
        print(f"{r['step']:>6} {fmt(r['ref_loss'])} {fmt(r['ref_loss_w'])} "
              f"{fmt(r['ours_loss'])} {fmt(r['ours_loss_w'])}")
    if args.out:
        args.out.write_text(json.dumps(report, indent=2))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
