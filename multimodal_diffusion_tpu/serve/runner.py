"""Serving runner — batched manifest-driven inference daemon.

Production deployment shape the reference never had (its sampler is a
one-shot CLI): a resident process that loads the model ONCE, keeps the
scan-compiled samplers warm (one jit trace per direction at a fixed batch
size), and drives request streams through the batch axis — continuous
batching: whatever requests are queued when the device frees up form the
next batch (padded to the fixed shape so nothing retraces).

Two frontends over the same scheduler:

  * manifest mode: `--manifest requests.json` processes a list of
    {"id", "direction": "v2a"|"a2v", "input", "output"} requests and exits;
  * watch mode: `--watch inbox/` polls a directory for request JSON files,
    processes them in batches, writes `<id>.result.json` next to outputs.

    python -m multimodal_diffusion_tpu.serve.runner \
        --config configs/mvp.yaml --manifest requests.json [--ema]
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, List, Optional

import numpy as np


@dataclass
class Request:
    id: str
    direction: str  # "v2a" | "a2v"
    input_path: str
    output_path: str
    error: Optional[str] = None
    done: threading.Event = field(default_factory=threading.Event)


class BatchScheduler:
    """Continuous batching: drain up to `max_batch` queued requests per
    device call, per direction.  `run_batch(direction, requests)` is the
    injected executor (the runner binds it to the batched scan sampler)."""

    def __init__(self, run_batch: Callable[[str, List[Request]], None],
                 max_batch: int = 8, poll_s: float = 0.05):
        self._run = run_batch
        self.max_batch = int(max_batch)
        self.poll_s = float(poll_s)
        self._q: Dict[str, "queue.Queue[Request]"] = {
            "v2a": queue.Queue(), "a2v": queue.Queue()}
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self.batches_run = 0
        self._thread.start()

    def submit(self, req: Request) -> Request:
        if self._stop.is_set():
            # after shutdown() the loop is gone; failing the request here is
            # the only way its done event ever fires
            req.error = "scheduler is shut down"
            req.done.set()
            return req
        if req.direction not in self._q:
            req.error = f"unknown direction {req.direction!r}"
            req.done.set()
            return req
        self._q[req.direction].put(req)
        return req

    def _drain(self, direction: str) -> List[Request]:
        out: List[Request] = []
        q = self._q[direction]
        while len(out) < self.max_batch:
            try:
                out.append(q.get_nowait())
            except queue.Empty:
                break
        return out

    def _loop(self):
        try:
            while not self._stop.is_set():
                ran = False
                for direction in ("v2a", "a2v"):
                    batch = self._drain(direction)
                    if not batch:
                        continue
                    ran = True
                    try:
                        self._run(direction, batch)
                        self.batches_run += 1
                    except BaseException as e:  # per-batch failure ->
                        # per-request; BaseException too — a SystemExit out
                        # of jax must not strand waiters without an answer
                        for r in batch:
                            r.error = f"{type(e).__name__}: {e}"
                            r.done.set()
                        if isinstance(e, (KeyboardInterrupt, SystemExit)):
                            # interpreter-shutdown signals end the loop (the
                            # finally block drains + fails the rest) rather
                            # than being swallowed into serving-as-usual
                            raise
                    else:
                        for r in batch:
                            r.done.set()
                if not ran:
                    time.sleep(self.poll_s)
        finally:
            # loop exiting for ANY reason: fail whatever is still queued so
            # process_manifest/watch waiters wake instead of hanging forever
            self._stop.set()
            for direction in ("v2a", "a2v"):
                for r in self._drain(direction):
                    r.error = r.error or "scheduler loop exited"
                    r.done.set()

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=10)
        # fail requests that raced shutdown into the queues
        for direction in ("v2a", "a2v"):
            for r in self._drain(direction):
                r.error = r.error or "scheduler is shut down"
                r.done.set()


class InferenceRunner:
    """Model + warm samplers + IO; binds BatchScheduler to the device."""

    def __init__(self, cfg: Dict, use_ema: bool = False,
                 bf16_params: bool = True, max_batch: int = 8):
        from ..infer.sample_clip import build_components

        self.cfg = cfg
        self.model, self.params = build_components(
            cfg, use_ema=use_ema, bf16_params=bf16_params)
        self.sr = int(cfg["audio"]["sr"])
        self.fps = int(cfg["video"]["fps"])
        self.size_hw = tuple(int(x) for x in cfg["video"]["size"])
        self.scheduler = BatchScheduler(self._run_batch, max_batch=max_batch)

    # ---------------- per-batch device call ----------------

    def _run_batch(self, direction: str, reqs: List[Request]):
        from ..infer.sample_clip import sample_one_direction
        from ..media.audio_io import read_wav, write_wav
        from ..media.video_io import load_frames_dir, write_frames

        B = self.scheduler.max_batch
        ok: List[Request] = []
        if direction == "v2a":
            prompts = []
            T = int(round(self.fps * float(self.cfg["data"]["clip_seconds"])))
            for r in reqs:
                try:
                    fr = load_frames_dir(Path(r.input_path),
                                         size_hw=self.size_hw)
                    if fr.shape[0] < T:
                        fr = np.concatenate(
                            [fr, np.repeat(fr[-1:], T - fr.shape[0], 0)])
                    prompts.append(fr[:T])
                    ok.append(r)
                except Exception as e:
                    r.error = f"load: {e}"
            if not ok:
                return
            batch = np.stack(prompts)
            pad = B - batch.shape[0]
            if pad > 0:
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], pad, 0)])
            out = sample_one_direction(
                cfg=self.cfg, model=self.model, params=self.params,
                prompt_modality="video", prompt_video=batch)
            for i, r in enumerate(ok):
                write_wav(Path(r.output_path), out["audio"][i], out["sr"])
        else:
            prompts = []
            L = int(round(self.sr * float(self.cfg["data"]["clip_seconds"])))
            for r in reqs:
                try:
                    y, _ = read_wav(Path(r.input_path), sr=self.sr)
                    if y.shape[0] < L:
                        y = np.concatenate([y, np.zeros(L - len(y), np.float32)])
                    prompts.append(y[:L])
                    ok.append(r)
                except Exception as e:
                    r.error = f"load: {e}"
            if not ok:
                return
            batch = np.stack(prompts)
            pad = B - batch.shape[0]
            if pad > 0:
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], pad, 0)])
            out = sample_one_direction(
                cfg=self.cfg, model=self.model, params=self.params,
                prompt_modality="audio", prompt_audio=batch)
            for i, r in enumerate(ok):
                write_frames(out["video"][i], Path(r.output_path),
                             fps=out["fps"])

    # ---------------- frontends ----------------

    def process_manifest(self, manifest_path) -> List[Request]:
        items = json.loads(Path(manifest_path).read_text())
        if isinstance(items, dict):
            items = items.get("requests", [])
        reqs = [
            Request(id=str(it.get("id", i)), direction=it["direction"],
                    input_path=it["input"], output_path=it["output"])
            for i, it in enumerate(items)
        ]
        for r in reqs:
            self.scheduler.submit(r)
        for r in reqs:
            r.done.wait()
        return reqs

    def watch(self, inbox, poll_s: float = 0.5,
              stop_event: Optional[threading.Event] = None):
        """Poll `inbox` for `*.json` request files until stop_event (or a
        file named `STOP` appears)."""
        inbox = Path(inbox)
        seen = set()
        while stop_event is None or not stop_event.is_set():
            if (inbox / "STOP").exists():
                break
            pending = []
            for p in sorted(inbox.glob("*.json")):
                if p.name.endswith(".result.json") or p in seen:
                    continue
                seen.add(p)
                try:
                    it = json.loads(p.read_text())
                    pending.append((p, Request(
                        id=str(it.get("id", p.stem)),
                        direction=it["direction"], input_path=it["input"],
                        output_path=it["output"])))
                except Exception as e:
                    (p.with_suffix(".result.json")).write_text(
                        json.dumps({"ok": False, "error": str(e)}))
            for _, r in pending:
                self.scheduler.submit(r)
            for p, r in pending:
                r.done.wait()
                p.with_suffix(".result.json").write_text(json.dumps({
                    "ok": r.error is None, "error": r.error,
                    "output": r.output_path}))
            time.sleep(poll_s)

    def close(self):
        self.scheduler.shutdown()


def main(argv=None):
    ap = argparse.ArgumentParser(description="Batched inference runner")
    ap.add_argument("--config", type=str, nargs="+", required=True)
    ap.add_argument("--manifest", type=Path, default=None)
    ap.add_argument("--watch", type=Path, default=None)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--device", type=str, default=None)
    args = ap.parse_args(argv)
    if not args.manifest and not args.watch:
        ap.error("supply --manifest or --watch")

    from ..infer.sample_clip import select_device
    from ..utils.io import load_config

    select_device(args.device)
    cfg = load_config(*args.config)
    runner = InferenceRunner(cfg, use_ema=args.ema, max_batch=args.max_batch)
    try:
        if args.manifest:
            reqs = runner.process_manifest(args.manifest)
            n_ok = sum(1 for r in reqs if r.error is None)
            print(f"[serve] {n_ok}/{len(reqs)} ok in "
                  f"{runner.scheduler.batches_run} device batches")
            for r in reqs:
                if r.error:
                    print(f"[serve] {r.id}: ERROR {r.error}")
        else:
            print(f"[serve] watching {args.watch} (create STOP file to exit)")
            runner.watch(args.watch)
    finally:
        runner.close()


if __name__ == "__main__":
    main()
