"""Stall-detecting supervisor (tools/supervise.py): detect a hung child via
progress-file growth, SIGTERM it, restart, and propagate clean completion.
Children are real subprocesses (the production signal path), simulated with
tiny scripts — no TPU, no jax."""

import pytest

import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SUPERVISE = REPO / "tools" / "supervise.py"


def _run(tmp_path, child_src, *, startup=10, stall=2, restarts=2,
         backoff=0.2, timeout=90):
    child = tmp_path / "child.py"
    child.write_text(textwrap.dedent(child_src))
    progress = tmp_path / "metrics.jsonl"
    cmd = [sys.executable, str(SUPERVISE),
           "--progress-file", str(progress),
           "--startup-seconds", str(startup),
           "--stall-seconds", str(stall),
           "--grace-seconds", "5",
           "--max-restarts", str(restarts),
           "--backoff-seconds", str(backoff),
           "--", sys.executable, str(child), str(tmp_path)]
    return subprocess.run(cmd, capture_output=True, text=True,
                          timeout=timeout)


def test_clean_child_passes_through(tmp_path):
    # stall=30: this test asserts the CLEAN path only; a tight stall window
    # turns co-tenant CPU contention (0.1s write gaps stretched past 2s)
    # into spurious restarts.  Stall detection has its own test below.
    r = _run(tmp_path, """
        import sys, time
        from pathlib import Path
        p = Path(sys.argv[1]) / "metrics.jsonl"
        for i in range(3):
            p.open("a").write(f'{{"step": {i}}}\\n')
            time.sleep(0.1)
    """, stall=30)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "completed cleanly" in r.stdout
    assert "STALL" not in r.stdout


@pytest.mark.slow
def test_stalled_child_is_killed_and_restart_resumes(tmp_path):
    # first run: one progress line then hang; second run (state file
    # exists): finish cleanly — models --resume picking up the checkpoint
    r = _run(tmp_path, """
        import sys, time
        from pathlib import Path
        root = Path(sys.argv[1])
        p = root / "metrics.jsonl"
        state = root / "state"
        if state.exists():
            p.open("a").write('{"step": 2}\\n')
            sys.exit(0)
        state.write_text("ran once")
        p.open("a").write('{"step": 1}\\n')
        time.sleep(3600)
    """)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "STALL (run)" in r.stdout
    assert "restart 1/" in r.stdout
    assert "completed cleanly" in r.stdout


@pytest.mark.slow
def test_startup_stall_uses_startup_deadline(tmp_path):
    # never writes progress: startup deadline (3 s) must fire, not the
    # shorter stall deadline, and the supervisor gives up after retries
    r = _run(tmp_path, """
        import time
        time.sleep(3600)
    """, startup=3, stall=1, restarts=1, timeout=120)
    assert r.returncode != 0
    assert "STALL (startup)" in r.stdout
    assert "giving up" in r.stdout


@pytest.mark.slow
def test_crashing_child_is_restarted(tmp_path):
    r = _run(tmp_path, """
        import sys
        from pathlib import Path
        root = Path(sys.argv[1])
        state = root / "crashes"
        n = int(state.read_text()) if state.exists() else 0
        state.write_text(str(n + 1))
        p = root / "metrics.jsonl"
        p.open("a").write(f'{{"step": {n}}}\\n')
        sys.exit(0 if n >= 1 else 7)
    """)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "rc=7" in r.stdout
    assert "completed cleanly" in r.stdout


@pytest.mark.slow
def test_launch_failures_have_own_budget(tmp_path):
    """A child that dies before its FIRST progress (backend unavailable)
    consumes the launch-failure budget — not the restart budget — and is
    retried with the outage backoff until the budget runs out."""
    import textwrap

    child = tmp_path / "child.py"
    child.write_text(textwrap.dedent("""
        import sys
        sys.exit(13)  # dies before any progress-file growth
    """))
    progress = tmp_path / "metrics.jsonl"
    cmd = [sys.executable, str(SUPERVISE),
           "--progress-file", str(progress),
           "--startup-seconds", "60", "--stall-seconds", "60",
           "--grace-seconds", "2",
           "--max-restarts", "0",          # no ordinary restarts at all
           "--max-launch-failures", "3",
           "--outage-backoff-seconds", "0.1",
           "--fast-fail-seconds", "0",     # model a SLOW outage exit: keep
                                           # the deterministic-bug classifier
                                           # out of this test
           "--", sys.executable, str(child)]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert r.returncode == 13, r.stdout + r.stderr
    assert "launch failure 3/3" in r.stdout
    assert "giving up: 4 launch failures" in r.stdout


@pytest.mark.slow
def test_fast_identical_failures_are_a_bug_not_an_outage(tmp_path):
    """An instantly-crashing child (config typo) must surface after 4 tries
    instead of burning the multi-hour outage budget (review finding)."""
    child = tmp_path / "child.py"
    child.write_text("import sys; sys.exit(13)\n")
    cmd = [sys.executable, str(SUPERVISE),
           "--progress-file", str(tmp_path / "metrics.jsonl"),
           "--startup-seconds", "60", "--stall-seconds", "60",
           "--grace-seconds", "2", "--max-restarts", "0",
           "--max-launch-failures", "48",
           "--outage-backoff-seconds", "0.1",
           "--", sys.executable, str(child)]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert r.returncode == 13, r.stdout + r.stderr
    assert "consecutive fast identical failures" in r.stdout
    assert "launch failure 4/" not in r.stdout


@pytest.mark.slow
def test_stall_sigterm_clean_exit_restarts_not_completes(tmp_path):
    """The trainer's preempt path exits 0 on the supervisor's stall SIGTERM
    — that is a restart, not completion (review finding: the supervisor
    used to declare 'completed cleanly' and strand the run mid-way)."""
    r = _run(tmp_path, """
        import signal, sys, time
        from pathlib import Path
        root = Path(sys.argv[1])
        p = root / "metrics.jsonl"
        state = root / "resumed"
        if state.exists():
            p.open("a").write('{"step": 2}\\n')
            sys.exit(0)
        state.write_text("x")
        # clean-exit-0 on SIGTERM, like train_joint's preempt path
        signal.signal(signal.SIGTERM, lambda *a: sys.exit(0))
        p.open("a").write('{"step": 1}\\n')
        time.sleep(3600)
    """)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "STALL (run)" in r.stdout
    assert "restart 1/" in r.stdout
    assert "stall, clean child exit" in r.stdout
    assert "completed cleanly" in r.stdout
