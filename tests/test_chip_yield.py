"""Chip-yield arbitration (utils/chip_claim.py + tools/supervise.py).

VERDICT r3 #1: one tunneled TPU chip, and a supervised training campaign
held it while the driver ran bench.py -> FailedPrecondition, no round-3
headline number.  These tests prove the fix end-to-end with real
subprocesses and signals (no TPU, no jax): a probe's claim makes the
supervisor SIGTERM its trainer (which "checkpoints" and exits cleanly),
ack the claim once the chip is free, hold relaunches while the claim
lives, and resume training after release.

The reference has no counterpart — its trainer assumes exclusive devices
(`/root/reference/avdiff/models/train/train_joint.py`).
"""

import json
import os
import signal
import subprocess
import sys
import textwrap
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SUPERVISE = REPO / "tools" / "supervise.py"

sys.path.insert(0, str(REPO))
from multimodal_diffusion_tpu.utils import chip_claim  # noqa: E402

# a trainer stand-in with the production signal contract: makes progress
# forever, and on SIGTERM writes a checkpoint marker and exits 0 (the
# preempt path tests/test_preemption.py proves for the real trainer)
FAKE_TRAINER = textwrap.dedent("""
    import os, signal, sys, time
    from pathlib import Path
    d = Path(sys.argv[1])
    (d / "trainer.pid").write_text(str(os.getpid()))
    stop = []
    signal.signal(signal.SIGTERM, lambda *a: stop.append(1))
    i = 0
    while not stop:
        (d / "metrics.jsonl").open("a").write('{"step": %d}\\n' % i)
        i += 1
        time.sleep(0.1)
    (d / "ckpt.marker").open("a").write("ckpt\\n")
    sys.exit(0)
""")


def _wait(cond, timeout, what):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return
        time.sleep(0.2)
    raise AssertionError(f"timed out ({timeout}s) waiting for {what}")


def _pid_alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def test_claim_with_no_owner_returns_immediately(tmp_path):
    claim = tmp_path / "chip.claim"
    t0 = time.time()
    chip_claim.acquire("unit", claim, poll=0.1)
    assert time.time() - t0 < 2.0
    assert chip_claim.valid_claim(claim)["tag"] == "unit"
    chip_claim.release(claim)
    assert chip_claim.valid_claim(claim) is None


def test_stale_claim_of_dead_pid_is_ignored_and_replaced(tmp_path):
    claim = tmp_path / "chip.claim"
    dead = subprocess.Popen([sys.executable, "-c", "pass"])
    dead.wait()
    claim.write_text(json.dumps({"pid": dead.pid, "tag": "ghost",
                                 "time": time.time()}))
    assert chip_claim.valid_claim(claim) is None  # dead claimer = no claim
    chip_claim.acquire("unit2", claim, poll=0.1, queue_timeout=5)
    assert chip_claim.valid_claim(claim)["tag"] == "unit2"
    chip_claim.release(claim)


def test_nested_acquire_under_wrapper_claim_is_noop(tmp_path, monkeypatch):
    """A self-claiming tool run under `python -m ...chip_claim -- tool` must
    not queue behind its own wrapper's claim (observed deadlock: the
    wrapper's live claim is foreign by pid, so the child waited the full
    queue_timeout).  The CLI exports MMDIFF_CHIP_CLAIMED to its children;
    acquire() under that marker is a no-op."""
    claim = tmp_path / "chip.claim"
    holder = subprocess.Popen([sys.executable, "-c",
                               "import time; time.sleep(30)"])
    try:
        claim.write_text(json.dumps({"pid": holder.pid, "tag": "wrapper",
                                     "time": time.time()}))
        monkeypatch.setenv("MMDIFF_CHIP_CLAIMED", "1")
        t0 = time.time()
        chip_claim.acquire("inner", claim, queue_timeout=5, poll=0.2)
        assert time.time() - t0 < 1.0
        # wrapper's claim untouched
        assert chip_claim.valid_claim(claim)["tag"] == "wrapper"
    finally:
        holder.terminate()
        holder.wait()


def test_queue_times_out_behind_live_foreign_claim(tmp_path):
    claim = tmp_path / "chip.claim"
    holder = subprocess.Popen([sys.executable, "-c",
                               "import time; time.sleep(30)"])
    try:
        claim.write_text(json.dumps({"pid": holder.pid, "tag": "holder",
                                     "time": time.time()}))
        with pytest.raises(TimeoutError):
            chip_claim.acquire("late", claim, queue_timeout=1.0, poll=0.2)
    finally:
        holder.terminate()
        holder.wait()


@pytest.mark.slow
def test_supervisor_yields_to_claim_and_resumes(tmp_path):
    claim = tmp_path / "chip.claim"
    child = tmp_path / "trainer.py"
    child.write_text(FAKE_TRAINER)
    progress = tmp_path / "metrics.jsonl"
    sup = subprocess.Popen(
        [sys.executable, str(SUPERVISE),
         "--progress-file", str(progress),
         "--claim-file", str(claim),
         "--startup-seconds", "60", "--stall-seconds", "60",
         "--grace-seconds", "15",
         "--max-restarts", "5", "--backoff-seconds", "0.2",
         "--", sys.executable, str(child), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        # supervisor advertises itself and the trainer makes progress
        _wait(lambda: chip_claim.owner_alive(claim), 30, "owner file")
        _wait(lambda: progress.exists() and progress.stat().st_size > 0,
              30, "first trainer progress")
        pid1 = int((tmp_path / "trainer.pid").read_text())

        # a probe claims the chip: supervisor must stop the trainer
        # (clean-checkpoint path) and ack
        chip_claim.acquire("test-bench", claim, ack_timeout=60, poll=0.2)
        assert (tmp_path / "ckpt.marker").exists(), \
            "trainer was not SIGTERMed through its checkpoint path"
        _wait(lambda: not _pid_alive(pid1), 10, "trainer exit")

        # while the claim lives the supervisor must NOT relaunch
        size = progress.stat().st_size
        time.sleep(7.0)  # > one supervisor poll
        assert progress.stat().st_size == size, \
            "trainer relaunched while the claim was held"
        assert sup.poll() is None, "supervisor exited during yield"

        # release -> supervisor relaunches the SAME command (resume)
        chip_claim.release(claim)
        _wait(lambda: progress.stat().st_size > size, 30,
              "training resumed after release")
        pid2 = int((tmp_path / "trainer.pid").read_text())
        assert pid2 != pid1
    finally:
        sup.send_signal(signal.SIGTERM)
        try:
            sup.wait(timeout=30)
        except subprocess.TimeoutExpired:
            sup.kill()
            sup.wait()
    # owner cleared on supervisor exit
    assert chip_claim.owner_alive(claim) is None
    out = sup.stdout.read()
    assert "yielding" in out and "resuming training" in out, out
