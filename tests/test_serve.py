"""Serving runner: continuous batching over the warm scan sampler."""

import json
import threading

import numpy as np
import pytest
import yaml

from tests._tiny import tiny_cfg


@pytest.fixture(scope="module")
def runner():
    from multimodal_diffusion_tpu.serve.runner import InferenceRunner

    cfg = tiny_cfg()
    cfg["paths"] = {}
    r = InferenceRunner(cfg, max_batch=2, bf16_params=False)
    yield r
    r.close()


def _write_prompts(tmp_path, n):
    from multimodal_diffusion_tpu.media.audio_io import write_wav
    from multimodal_diffusion_tpu.media.video_io import write_frames

    rng = np.random.default_rng(0)
    reqs = []
    for i in range(n):
        if i % 2 == 0:
            fdir = tmp_path / f"frames_{i}"
            write_frames(
                rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8), fdir)
            reqs.append({"id": f"r{i}", "direction": "v2a",
                         "input": str(fdir),
                         "output": str(tmp_path / f"out_{i}.wav")})
        else:
            wav = tmp_path / f"in_{i}.wav"
            write_wav(wav, rng.uniform(-0.5, 0.5, 8000).astype(np.float32),
                      8000)
            reqs.append({"id": f"r{i}", "direction": "a2v",
                         "input": str(wav),
                         "output": str(tmp_path / f"out_{i}_frames")})
    return reqs


def test_manifest_mode_batches_both_directions(runner, tmp_path):
    from multimodal_diffusion_tpu.media.audio_io import read_wav

    reqs = _write_prompts(tmp_path, 5)  # 3 v2a + 2 a2v
    man = tmp_path / "requests.json"
    man.write_text(json.dumps({"requests": reqs}))

    done = runner.process_manifest(man)
    assert all(r.error is None for r in done), [r.error for r in done]
    # 3 v2a at max_batch=2 -> 2 batches; 2 a2v -> 1 batch (scheduling may
    # split differently under timing, so just require >= 3 total)
    assert runner.scheduler.batches_run >= 3

    wav, sr = read_wav(tmp_path / "out_0.wav")
    assert sr == 8000 and wav.shape == (8000,) and np.isfinite(wav).all()
    frames = sorted((tmp_path / "out_1_frames").glob("frame_*.jpg"))
    assert len(frames) == 8


def test_bad_request_reports_error(runner, tmp_path):
    from multimodal_diffusion_tpu.serve.runner import Request

    r = runner.submit(Request(
        id="bad", direction="v2a", input_path=str(tmp_path / "nope"),
        output_path=str(tmp_path / "x.wav")))
    assert r.done.wait(timeout=60)
    assert r.error is not None and "load" in r.error

    r2 = runner.submit(Request(
        id="baddir", direction="sideways", input_path="x", output_path="y"))
    assert r2.done.wait(timeout=5) and "unknown direction" in r2.error


def test_scheduler_backpressure_queue_cap():
    """Bounded admission: with max_queue=2 and a stalled executor, excess
    items fail fast with a backpressure error instead of growing RAM."""
    import time

    from multimodal_diffusion_tpu.serve.runner import BatchScheduler, WorkItem

    gate = threading.Event()

    def slow_run(items):
        gate.wait(timeout=30)

    sched = BatchScheduler(slow_run, max_batch=1, max_queue=2)
    try:
        items = [WorkItem("v2a", np.zeros((4,), np.float32))
                 for _ in range(6)]
        # first fills the executor + queue; rest must hit the cap
        ok = sched.submit_items(items, timeout=0.2)
        assert not ok
        failed = [it for it in items if it.error and "queue full" in it.error]
        assert len(failed) >= 2, [it.error for it in items]
        gate.set()
        deadline = time.time() + 30
        for it in items:
            assert it.done.wait(timeout=max(0.1, deadline - time.time()))
        done_ok = [it for it in items if it.error is None]
        assert len(done_ok) == len(items) - len(failed)
    finally:
        gate.set()
        sched.shutdown()


def test_scheduler_blocking_backpressure_completes_all():
    """With no timeout, submit blocks while the consumer drains — a slow
    consumer throttles the producer and every item still completes."""
    from multimodal_diffusion_tpu.serve.runner import BatchScheduler, WorkItem

    ran = []

    def run(items):
        time.sleep(0.02)  # slow consumer
        for it in items:
            it.out = it.prompt + 1
        ran.append(len(items))

    import time

    sched = BatchScheduler(run, max_batch=2, max_queue=2)
    try:
        items = [WorkItem("v2a", np.full((3,), i, np.float32))
                 for i in range(12)]
        assert sched.submit_items(items, timeout=None)
        for it in items:
            assert it.done.wait(timeout=30) and it.error is None
        assert sum(ran) == 12
    finally:
        sched.shutdown()


def test_scheduler_shape_keyed_batches():
    """Items of different prompt shapes never share a device batch (each
    batch must be stackable / one jit trace)."""
    from multimodal_diffusion_tpu.serve.runner import BatchScheduler, WorkItem

    shapes_seen = []

    def run(items):
        shapes = {it.prompt.shape for it in items}
        shapes_seen.append(shapes)
        for it in items:
            it.out = it.prompt

    sched = BatchScheduler(run, max_batch=8, max_queue=64)
    try:
        items = ([WorkItem("v2a", np.zeros((4,), np.float32))
                  for _ in range(5)]
                 + [WorkItem("v2a", np.zeros((6,), np.float32))
                    for _ in range(5)])
        sched.submit_items(items)
        for it in items:
            assert it.done.wait(timeout=30) and it.error is None
        assert all(len(s) == 1 for s in shapes_seen), shapes_seen
    finally:
        sched.shutdown()


def test_streaming_request_through_daemon(runner, tmp_path):
    """E2E: a stream_v2a request rides the scheduler — windows are batched
    work items, the finalizer crossfade-stitches and writes one wav."""
    from multimodal_diffusion_tpu.media.video_io import write_frames
    from multimodal_diffusion_tpu.media.audio_io import read_wav
    from multimodal_diffusion_tpu.serve.runner import Request

    # 2 s of frames at fps=8; window = clip_seconds (1 s), hop 0.5 s
    runner.win_s, runner.hop_s, runner.xfade_s = 1.0, 0.5, 0.25
    rng = np.random.default_rng(1)
    fdir = tmp_path / "stream_frames"
    write_frames(rng.integers(0, 255, (16, 32, 32, 3), dtype=np.uint8), fdir)
    out_wav = tmp_path / "stream_out.wav"

    r = runner.submit(Request(id="s0", direction="stream_v2a",
                              input_path=str(fdir),
                              output_path=str(out_wav)))
    assert r.done.wait(timeout=300)
    assert r.error is None, r.error
    wav, sr = read_wav(out_wav)
    assert sr == 8000 and np.isfinite(wav).all()
    # 3 windows at hop 0.5 s stitch to ~2 s of audio
    assert wav.shape[0] >= 8000 * 1.5


def test_watch_mode(runner, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    reqs = _write_prompts(tmp_path, 2)
    for i, it in enumerate(reqs):
        (inbox / f"req_{i}.json").write_text(json.dumps(it))

    stop = threading.Event()
    t = threading.Thread(
        target=runner.watch, args=(inbox,),
        kwargs={"poll_s": 0.1, "stop_event": stop}, daemon=True)
    t.start()
    deadline = 120
    import time

    t0 = time.time()
    while time.time() - t0 < deadline:
        results = list(inbox.glob("*.result.json"))
        if len(results) == 2:
            break
        time.sleep(0.5)
    stop.set()
    (inbox / "STOP").touch()
    t.join(timeout=10)
    results = {p.name: json.loads(p.read_text())
               for p in inbox.glob("*.result.json")}
    assert len(results) == 2 and all(v["ok"] for v in results.values()), results
