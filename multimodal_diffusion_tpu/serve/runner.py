"""Serving runner — batched inference daemon with bounded admission.

A resident process that loads the model ONCE, keeps the scan-compiled
samplers warm, and drives request streams through the sampler's batch axis
(continuous batching).  The reference has no serving story at all (its
sampler is a one-shot CLI, `avdiff/models/infer/sample_clip.py`).

Scheduling model:

  * Work is admitted as `WorkItem`s — one loaded prompt each (a full clip,
    or ONE window of a streaming request) — queued per
    (direction, prompt-shape) key so every device batch is stackable and
    hits exactly one jit trace.
  * Admission is BOUNDED (`max_queue` total items).  `submit` blocks for
    space up to a timeout, then fails the remainder with "queue full" —
    backpressure reaches the caller instead of host RAM.
  * The scheduler thread is event-driven (condition variable woken by
    submits), not a poll loop; prompt loading and output writing happen on
    the submitting / finalizer side, so the device thread only stacks
    arrays and calls the sampler.
  * Streaming requests ride the SAME scheduler: their windows are ordinary
    work items (interleaving freely with clip requests of the same shape),
    and a finalizer crossfade-stitches the window outputs
    (infer/stream_infer.py) once all arrive.

Two frontends over the same scheduler:

  * manifest mode: `--manifest requests.json` processes a list of
    {"id", "direction": "v2a"|"a2v"|"stream_v2a"|"stream_a2v",
     "input", "output"} requests and exits;
  * watch mode: `--watch inbox/` polls a directory for request JSON files
    and writes `<id>.result.json` AS EACH REQUEST COMPLETES (no
    head-of-line blocking on the slowest request of a wave).

    python -m multimodal_diffusion_tpu.serve.runner \
        --config configs/mvp.yaml --manifest requests.json [--ema]
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Deque, Dict, List, Optional, Tuple

import numpy as np


@dataclass
class WorkItem:
    """One device-batchable unit: a loaded prompt headed for the sampler's
    batch axis (a whole clip, or one streaming window)."""

    direction: str  # "v2a" | "a2v"
    prompt: np.ndarray
    out: Optional[np.ndarray] = None
    error: Optional[str] = None
    done: threading.Event = field(default_factory=threading.Event)
    enq_t: float = 0.0  # monotonic admission time (set by submit_items)

    @property
    def key(self) -> Tuple:
        return (self.direction, self.prompt.shape)

    def fail(self, msg: str):
        self.error = self.error or msg
        self.done.set()


@dataclass
class Request:
    id: str
    direction: str  # "v2a" | "a2v" | "stream_v2a" | "stream_a2v"
    input_path: str
    output_path: str
    error: Optional[str] = None
    done: threading.Event = field(default_factory=threading.Event)


class BatchScheduler:
    """Continuous batching with bounded admission over shape-keyed queues.

    `run_batch(items)` is the injected executor (the runner binds it to the
    batched scan sampler); every call receives items sharing one
    (direction, shape) key.  The fullest queue is served first — UNLESS some
    queue's head item has waited longer than `fairness_age_s`, in which case
    the oldest head wins: without aging, a sustained stream on one key
    (e.g. streaming windows refilling the queue as fast as it drains) would
    starve a minority-shape request forever."""

    def __init__(self, run_batch: Callable[[List[WorkItem]], None],
                 max_batch: int = 8, max_queue: int = 64,
                 fairness_age_s: float = 10.0):
        self._run = run_batch
        self.max_batch = int(max_batch)
        self.max_queue = int(max_queue)
        self.fairness_age_s = float(fairness_age_s)
        self._cv = threading.Condition()
        self._queues: Dict[Tuple, Deque[WorkItem]] = {}
        self._n_queued = 0
        self._stop = threading.Event()
        self.batches_run = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ---------------- admission ----------------

    def submit_items(self, items: List[WorkItem],
                     timeout: Optional[float] = None) -> bool:
        """Admit items one at a time, blocking while the total queue is at
        `max_queue`.  On timeout (or shutdown) the NOT-yet-admitted items
        are failed with a backpressure error and False is returned — the
        caller learns it is overrunning the service instead of the host
        accumulating unbounded work."""
        deadline = None if timeout is None else time.monotonic() + timeout
        for idx, it in enumerate(items):
            with self._cv:
                while (self._n_queued >= self.max_queue
                       and not self._stop.is_set()):
                    rem = (None if deadline is None
                           else deadline - time.monotonic())
                    if rem is not None and rem <= 0:
                        break
                    self._cv.wait(rem)
                if self._stop.is_set():
                    for rest in items[idx:]:
                        rest.fail("scheduler is shut down")
                    return False
                if self._n_queued >= self.max_queue:
                    for rest in items[idx:]:
                        rest.fail(
                            f"queue full ({self.max_queue} items) — "
                            "backpressure timeout")
                    return False
                it.enq_t = time.monotonic()
                self._queues.setdefault(it.key, deque()).append(it)
                self._n_queued += 1
                self._cv.notify_all()
        return True

    # ---------------- device loop ----------------

    def _next_batch(self) -> Optional[List[WorkItem]]:
        with self._cv:
            while self._n_queued == 0 and not self._stop.is_set():
                self._cv.wait()
            if self._stop.is_set():
                return None
            oldest = min(self._queues, key=lambda k: self._queues[k][0].enq_t)
            if (time.monotonic() - self._queues[oldest][0].enq_t
                    > self.fairness_age_s):
                key = oldest  # anti-starvation: serve the longest waiter
            else:
                key = max(self._queues, key=lambda k: len(self._queues[k]))
            dq = self._queues[key]
            batch = [dq.popleft()
                     for _ in range(min(self.max_batch, len(dq)))]
            if not dq:
                del self._queues[key]
            self._n_queued -= len(batch)
            self._cv.notify_all()  # wake blocked submitters: space freed
            return batch

    def _loop(self):
        try:
            while True:
                batch = self._next_batch()
                if batch is None:
                    return
                try:
                    self._run(batch)
                    self.batches_run += 1
                except BaseException as e:  # per-batch failure -> per-item;
                    # BaseException too — a SystemExit out of jax must not
                    # strand waiters without an answer
                    for it in batch:
                        it.fail(f"{type(e).__name__}: {e}")
                    if isinstance(e, (KeyboardInterrupt, SystemExit)):
                        # interpreter-shutdown signals end the loop (the
                        # finally block drains + fails the rest) rather
                        # than being swallowed into serving-as-usual
                        raise
                else:
                    for it in batch:
                        it.done.set()
        finally:
            # loop exiting for ANY reason: fail whatever is still queued so
            # waiters wake instead of hanging forever
            with self._cv:
                self._stop.set()
                leftovers = [it for dq in self._queues.values() for it in dq]
                self._queues.clear()
                self._n_queued = 0
                self._cv.notify_all()
            for it in leftovers:
                it.fail("scheduler loop exited")

    def shutdown(self):
        with self._cv:
            self._stop.set()
            self._cv.notify_all()
        self._thread.join(timeout=10)


class InferenceRunner:
    """Model + warm samplers + IO; binds BatchScheduler to the device."""

    DIRECTIONS = ("v2a", "a2v", "stream_v2a", "stream_a2v")

    def __init__(self, cfg: Dict, use_ema: bool = False,
                 bf16_params: bool = True, max_batch: int = 8,
                 max_queue: int = 64,
                 submit_timeout: Optional[float] = None):
        from ..infer.sample_clip import build_components

        self.cfg = cfg
        self.model, self.params = build_components(
            cfg, use_ema=use_ema, bf16_params=bf16_params)
        self.sr = int(cfg["audio"]["sr"])
        self.fps = int(cfg["video"]["fps"])
        self.size_hw = tuple(int(x) for x in cfg["video"]["size"])
        stream = cfg.get("streaming", {}) or {}
        self.win_s = float(stream.get("window_seconds", 3.0))
        self.hop_s = float(stream.get("hop_seconds", 1.0))
        self.xfade_s = float(stream.get("crossfade_seconds", 0.25))
        self.submit_timeout = submit_timeout
        self.scheduler = BatchScheduler(
            self._run_batch, max_batch=max_batch, max_queue=max_queue)

    # ---------------- per-batch device call ----------------

    def _run_batch(self, items: List[WorkItem]):
        from ..infer.sample_clip import sample_one_direction

        direction = items[0].direction
        B = self.scheduler.max_batch
        batch = np.stack([it.prompt for it in items])
        pad = B - batch.shape[0]
        if pad > 0:
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad, 0)])
        if direction == "v2a":
            out = sample_one_direction(
                cfg=self.cfg, model=self.model, params=self.params,
                prompt_modality="video", prompt_video=batch)["audio"]
        else:
            out = sample_one_direction(
                cfg=self.cfg, model=self.model, params=self.params,
                prompt_modality="audio", prompt_audio=batch)["video"]
        for i, it in enumerate(items):
            it.out = np.asarray(out[i])

    # ---------------- request preparation / finalization ----------------

    def _load_video_prompt(self, path: str, n_frames: int) -> np.ndarray:
        from ..media.video_io import load_frames_dir

        fr = load_frames_dir(Path(path), size_hw=self.size_hw)
        if fr.shape[0] < n_frames:
            fr = np.concatenate(
                [fr, np.repeat(fr[-1:], n_frames - fr.shape[0], 0)])
        return fr

    def _load_audio_prompt(self, path: str, n_samples: int) -> np.ndarray:
        from ..media.audio_io import read_wav

        y, _ = read_wav(Path(path), sr=self.sr)
        if y.shape[0] < n_samples:
            y = np.concatenate(
                [y, np.zeros(n_samples - len(y), np.float32)])
        return y

    def _prepare(self, req: Request) -> List[WorkItem]:
        """Load the request's prompt and cut it into work items (1 for clip
        requests, N windows for streaming)."""
        from ..infer.stream_infer import (split_audio_into_windows,
                                          split_frames_into_windows)

        clip_s = float(self.cfg["data"]["clip_seconds"])
        if req.direction == "v2a":
            T = int(round(self.fps * clip_s))
            return [WorkItem("v2a",
                             self._load_video_prompt(req.input_path, T)[:T])]
        if req.direction == "a2v":
            L = int(round(self.sr * clip_s))
            return [WorkItem("a2v",
                             self._load_audio_prompt(req.input_path, L)[:L])]
        if req.direction == "stream_v2a":
            frames = self._load_video_prompt(
                req.input_path, int(round(self.fps * self.win_s)))
            chunks, _, _ = split_frames_into_windows(
                frames, self.fps, self.win_s, self.hop_s)
            return [WorkItem("v2a", c) for c in chunks]
        # stream_a2v
        wav = self._load_audio_prompt(
            req.input_path, int(round(self.sr * self.win_s)))
        chunks, _, _ = split_audio_into_windows(
            wav, self.sr, self.win_s, self.hop_s)
        return [WorkItem("a2v", c) for c in chunks]

    def _finalize(self, req: Request, items: List[WorkItem]):
        """Wait for the request's items, stitch (streaming) and write the
        output.  Runs on a per-request daemon thread so IO never occupies
        the device loop; in-flight request count is bounded by the
        scheduler's admission bound."""
        from ..infer.stream_infer import crossfade_audio, crossfade_video
        from ..media.audio_io import write_wav
        from ..media.video_io import write_frames

        for it in items:
            it.done.wait()
        errs = [it.error for it in items if it.error]
        if errs:
            req.error = errs[0]
            req.done.set()
            return
        try:
            if req.direction == "v2a":
                write_wav(Path(req.output_path), items[0].out, self.sr)
            elif req.direction == "a2v":
                write_frames(items[0].out, Path(req.output_path),
                             fps=self.fps)
            elif req.direction == "stream_v2a":
                outs = np.stack([it.out for it in items])
                wav = crossfade_audio(
                    outs, sr=self.sr,
                    hop=int(round(self.sr * self.hop_s)),
                    win=int(round(self.sr * self.win_s)),
                    fade_s=self.xfade_s)
                write_wav(Path(req.output_path), wav, self.sr)
            else:  # stream_a2v
                outs = np.stack([it.out for it in items])
                frames = crossfade_video(
                    outs,
                    hop=int(round(self.fps * self.hop_s)),
                    win=int(round(self.fps * self.win_s)),
                    fade_f=int(round(self.xfade_s * self.fps)))
                write_frames(frames, Path(req.output_path), fps=self.fps)
        except Exception as e:
            req.error = f"write: {e}"
        req.done.set()

    _DEFAULT_TIMEOUT = object()

    def submit(self, req: Request,
               timeout=_DEFAULT_TIMEOUT) -> Request:
        """Admit one request: load its prompt, queue its work items (with
        backpressure), and hand completion to a finalizer thread.  Returns
        the request; wait on `req.done`."""
        if req.direction not in self.DIRECTIONS:
            req.error = f"unknown direction {req.direction!r}"
            req.done.set()
            return req
        try:
            items = self._prepare(req)
        except Exception as e:
            req.error = f"load: {e}"
            req.done.set()
            return req
        if timeout is self._DEFAULT_TIMEOUT:
            timeout = self.submit_timeout
        threading.Thread(target=self._finalize, args=(req, items),
                         daemon=True).start()
        self.scheduler.submit_items(items, timeout=timeout)
        return req

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
            self.submit(r)
        for r in reqs:
            r.done.wait()
        return reqs

    def watch(self, inbox, poll_s: float = 0.5,
              stop_event: Optional[threading.Event] = None,
              drain_timeout: float = 600.0,
              submit_timeout: float = 120.0):
        """Poll `inbox` for `*.json` request files until stop_event (or a
        file named `STOP` appears).  Results are written per request AS IT
        COMPLETES.  `seen` is pruned to files still on disk, so long-lived
        daemons don't grow state for deleted requests (deleting and
        re-creating a request file re-runs it).

        `submit_timeout` bounds how long one request's admission may block
        the watch loop when the queue is full (e.g. the device wedged
        mid-batch — a documented tunneled-TPU failure mode): past it the
        request fails with the backpressure error and gets its result file,
        and the loop returns to checking STOP/stop_event instead of
        blocking forever in submit."""
        inbox = Path(inbox)
        seen: set = set()
        inflight: Dict[Path, Request] = {}

        def flush():
            for p, r in list(inflight.items()):
                if r.done.is_set():
                    p.with_suffix(".result.json").write_text(json.dumps({
                        "ok": r.error is None, "error": r.error,
                        "output": r.output_path}))
                    del inflight[p]

        while stop_event is None or not stop_event.is_set():
            if (inbox / "STOP").exists():
                break
            existing = {p for p in inbox.glob("*.json")
                        if not p.name.endswith(".result.json")}
            seen &= existing | set(inflight)
            for p in sorted(existing):
                if p in seen:
                    continue
                seen.add(p)
                try:
                    it = json.loads(p.read_text())
                    inflight[p] = self.submit(Request(
                        id=str(it.get("id", p.stem)),
                        direction=it["direction"], input_path=it["input"],
                        output_path=it["output"]), timeout=submit_timeout)
                except Exception as e:
                    p.with_suffix(".result.json").write_text(
                        json.dumps({"ok": False, "error": str(e)}))
            flush()
            time.sleep(poll_s)
        # graceful drain: give in-flight requests a bounded window to finish
        deadline = time.monotonic() + drain_timeout
        for r in list(inflight.values()):
            r.done.wait(timeout=max(0.0, deadline - time.monotonic()))
        flush()

    def close(self):
        self.scheduler.shutdown()


def main(argv=None):
    ap = argparse.ArgumentParser(description="Batched inference runner")
    ap.add_argument("--config", type=str, nargs="+", required=True)
    ap.add_argument("--manifest", type=Path, default=None)
    ap.add_argument("--watch", type=Path, default=None)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-queue", type=int, default=64,
                    help="Admission bound (total queued work items)")
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--device", type=str, default=None)
    args = ap.parse_args(argv)
    if not args.manifest and not args.watch:
        ap.error("supply --manifest or --watch")

    from ..infer.sample_clip import select_device
    from ..utils.io import load_config

    select_device(args.device)
    cfg = load_config(*args.config)
    runner = InferenceRunner(cfg, use_ema=args.ema,
                             max_batch=args.max_batch,
                             max_queue=args.max_queue)
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
