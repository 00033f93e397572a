#!/usr/bin/env python3
"""Stall-detecting supervisor: run a training command, watch its progress
file, kill-and-restart on stall.  Completes the failure-detection story
(SURVEY §5: the reference has none; this repo already has SIGTERM-clean
checkpointing + --resume — this adds the DETECTOR that drives them).

Motivation is concrete: on this environment's tunneled TPU, a remote
compile or a large transfer occasionally wedges forever (no error, no
progress — the process must be killed and rerun; results are reproducible).
A human doing that is not a system; this is the system:

    python tools/supervise.py \
        --progress-file runs/x/logs/metrics.jsonl \
        --startup-seconds 3600 --stall-seconds 900 \
        --max-restarts 8 --backoff-seconds 60 -- \
        python -m multimodal_diffusion_tpu.train.train_joint \
            --config configs/mvp.yaml overlay.yaml --resume

Semantics:
  * progress = the progress file GROWING (size increase; metrics.jsonl
    gains a line per logged step).
  * --startup-seconds: deadline for the FIRST growth after (re)launch —
    covers data upload + compile, which legitimately take minutes.
  * --stall-seconds: max age of the last growth once running.
  * on stall: SIGTERM (the trainer checkpoints cleanly and exits —
    tests/test_preemption.py), escalate to SIGKILL after --grace-seconds.
  * restart the SAME command (include --resume so training continues);
    stop after --max-restarts or when the child exits 0 WITHOUT a stall
    kill (a clean exit 0 after our stall SIGTERM is the trainer's preempt
    path, not completion — it restarts).
  * fast (< 120 s) no-progress exits repeating the same rc are treated as
    a deterministic bug after 4 tries, not an infrastructure outage.

Exit code: the child's last exit code (0 on normal completion).
Never kills by pattern — only the child PID it spawned.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from multimodal_diffusion_tpu.utils import chip_claim  # noqa: E402


def _size(p: Path) -> int:
    try:
        return p.stat().st_size
    except OSError:
        return -1


def _stop_child(proc, grace_s: float, log) -> int:
    """SIGTERM -> clean checkpoint + exit (tests/test_preemption.py);
    SIGKILL only after the grace window."""
    proc.send_signal(signal.SIGTERM)
    try:
        proc.wait(timeout=grace_s)
    except subprocess.TimeoutExpired:
        log(f"[supervise] SIGKILL pid {proc.pid} after {grace_s:.0f}s grace")
        proc.kill()
        proc.wait()
    return proc.returncode


def run_once(cmd, progress: Path, startup_s: float, stall_s: float,
             grace_s: float, log, claim_file: Path = None,
             poll_s: float = 5.0) -> tuple[int, bool, bool, bool]:
    """Run cmd until exit, stall, or a chip claim.
    Returns (returncode, stalled, made_progress, yielded)."""
    # clamp to 0: a missing file reads -1, and the transition missing -> empty
    # (the trainer creating metrics.jsonl before its long upload/compile
    # phase) must NOT count as first progress — that would swap the generous
    # startup deadline for the tight stall deadline while zero steps have run
    base = max(_size(progress), 0)
    proc = subprocess.Popen(cmd)
    log(f"[supervise] launched pid {proc.pid}")
    started = time.time()
    last_growth = started
    grew_once = False
    try:
        while True:
            rc = proc.poll()
            if rc is not None:
                # final size check: a child can progress and exit between
                # 5 s polls — that's a run failure, not a launch failure
                if _size(progress) > base:
                    grew_once = True
                return rc, False, grew_once, False
            if claim_file is not None:
                cl = chip_claim.valid_claim(claim_file)
                if cl is not None:
                    log(f"[supervise] chip claim by pid {cl.get('pid')} "
                        f"(tag={cl.get('tag')!r}); yielding — SIGTERM pid "
                        f"{proc.pid} for clean checkpoint")
                    rc = _stop_child(proc, grace_s, log)
                    # ack whoever holds the claim NOW, not the pid captured
                    # before the SIGTERM: the grace window is minutes long,
                    # and in BENCH_r04 the original claimer (driver entry
                    # probe) died during it while bench.py wrote a fresh
                    # claim — acking the dead pid starved the live claimer
                    # for its full ack_timeout while the chip sat free.
                    now_cl = chip_claim.valid_claim(claim_file) or cl
                    chip_claim.write_ack(now_cl["pid"], claim_file)
                    log(f"[supervise] trainer exited rc={rc}; "
                        f"ack written for pid {now_cl['pid']}, "
                        f"chip is the claimer's")
                    return rc, False, grew_once or _size(progress) > base, True
            now = time.time()
            size = _size(progress)
            if size > base:
                base = size
                last_growth = now
                grew_once = True
            deadline = stall_s if grew_once else startup_s
            if now - last_growth > deadline:
                phase = "run" if grew_once else "startup"
                log(f"[supervise] STALL ({phase}): no progress in "
                    f"{now - last_growth:.0f}s > {deadline:.0f}s; "
                    f"SIGTERM pid {proc.pid}")
                _stop_child(proc, grace_s, log)
                return proc.returncode, True, grew_once, False
            time.sleep(poll_s)
    finally:
        if proc.poll() is None:  # supervisor itself interrupted
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(timeout=grace_s)
            except subprocess.TimeoutExpired:
                proc.kill()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--progress-file", type=Path, required=True)
    ap.add_argument("--startup-seconds", type=float, default=3600.0)
    ap.add_argument("--stall-seconds", type=float, default=900.0)
    ap.add_argument("--grace-seconds", type=float, default=120.0)
    ap.add_argument("--max-restarts", type=int, default=8)
    ap.add_argument("--backoff-seconds", type=float, default=60.0)
    ap.add_argument("--max-launch-failures", type=int, default=48,
                    help="separate, larger budget for exits that never made "
                         "progress (backend UNAVAILABLE during an "
                         "infrastructure outage — not a code bug; observed "
                         "multi-hour TPU-tunnel outages on this host)")
    ap.add_argument("--outage-backoff-seconds", type=float, default=300.0,
                    help="backoff between launch-failure retries (don't "
                         "hammer a down tunnel)")
    ap.add_argument("--fast-fail-seconds", type=float, default=120.0,
                    help="no-progress exits faster than this repeating the "
                         "same rc are a deterministic bug (give up after 4), "
                         "not an outage; 0 disables the classifier")
    ap.add_argument("--claim-file", type=Path,
                    default=chip_claim.DEFAULT_CLAIM,
                    help="chip-arbitration claim file (utils/chip_claim.py): "
                         "a probe writing it makes this supervisor stop the "
                         "trainer cleanly, ack, and resume when it clears; "
                         "'none' disables yielding")
    ap.add_argument("--poll-seconds", type=float, default=5.0,
                    help="watch-loop poll interval (tests shrink it)")
    ap.add_argument("--max-yield-seconds", type=float, default=7200.0,
                    help="reclaim the chip (delete a live claim) after this "
                         "long yielded — backstop against a wedged claimer "
                         "starving the training run")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to run")
    args = ap.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (pass it after --)")

    def log(msg):
        print(msg, flush=True)

    # SIGTERM to the supervisor must still tear down the child (Python's
    # default SIGTERM handling skips finally blocks)
    signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))

    claim_file = None if str(args.claim_file) == "none" else args.claim_file

    def wait_for_claim_clear():
        """Hold launches while a live claim exists (the claimer has the
        chip); reclaim after --max-yield-seconds as a wedge backstop.
        Returns True iff a reclaim was performed (callers must then treat
        fast relaunch failures as 'chip still busy', not a code bug).

        While in this loop the trainer is BY DEFINITION down, so the chip
        is free: every live claim must be ACKED here, within one poll.
        Round 4's headline bench died exactly because this loop only
        waited — bench.py's claim (written after the previous claimer died
        mid-yield) never got an ack while the supervisor sat 'waiting for
        claim to clear' on it (runs/specificity5/logs/supervise_r4b.log).
        """
        t0 = time.time()
        warned = False
        acked = None  # (pid, claim_time) last acked
        while claim_file is not None:
            cl = chip_claim.valid_claim(claim_file)
            if cl is None:
                return False
            key = (cl.get("pid"), cl.get("time"))
            if key != acked:
                chip_claim.write_ack(cl["pid"], claim_file)
                acked = key
                log(f"[supervise] acked claim by pid {cl.get('pid')} "
                    f"(tag={cl.get('tag')!r}) — trainer is down, chip free")
            if not warned:
                log(f"[supervise] waiting for chip claim by pid "
                    f"{cl.get('pid')} (tag={cl.get('tag')!r}) to clear")
                warned = True
            if time.time() - t0 > args.max_yield_seconds:
                log(f"[supervise] RECLAIM: claim held > "
                    f"{args.max_yield_seconds:.0f}s; deleting it")
                try:
                    claim_file.unlink()
                except OSError:
                    pass
                return True
            time.sleep(args.poll_seconds)
        return False

    if claim_file is not None:
        chip_claim.write_owner(claim_file)
    try:
        return _supervise_loop(args, cmd, claim_file, wait_for_claim_clear,
                               log)
    finally:
        if claim_file is not None:
            chip_claim.clear_owner(claim_file)


def _supervise_loop(args, cmd, claim_file, wait_for_claim_clear, log):
    attempt = 0
    launch_fails = 0
    fast_fails = 0
    last_fast_rc = None
    reclaim_grace = False  # True after a reclaim until a launch progresses
    reclaim_busy = 0
    rc = 1
    while attempt <= args.max_restarts:
        reclaim_grace = wait_for_claim_clear() or reclaim_grace
        t_run = time.time()
        rc, stalled, progressed, yielded = run_once(
            cmd, args.progress_file, args.startup_seconds,
            args.stall_seconds, args.grace_seconds, log,
            claim_file=claim_file, poll_s=args.poll_seconds)
        runtime = time.time() - t_run
        if progressed:
            reclaim_grace = False
            reclaim_busy = 0
        if yielded:
            # a yield is not a failure: wait for the claimer to finish,
            # then relaunch (--resume in cmd continues from the clean
            # checkpoint) without consuming the restart budget
            reclaim_grace = wait_for_claim_clear() or reclaim_grace
            log("[supervise] claim cleared; resuming training")
            continue
        if rc == 0 and not stalled:
            log("[supervise] child completed cleanly")
            return 0
        if rc == 0 and stalled:
            # the trainer's preempt path checkpoints and exits 0 on our
            # stall SIGTERM — that is NOT completion; restart so the run
            # continues from the checkpoint (the bug this guards against:
            # a co-tenant slowdown tripping the stall detector used to
            # make the supervisor declare victory mid-run)
            attempt += 1
            if attempt > args.max_restarts:
                break
            log(f"[supervise] restart {attempt}/{args.max_restarts} "
                f"(stall, clean child exit) after "
                f"{args.backoff_seconds:.0f}s backoff")
            time.sleep(args.backoff_seconds)
            continue
        if not stalled and not progressed:
            # never reached a first logged step.  A fast exit (< 120 s)
            # repeating the same rc is a deterministic code/config bug —
            # surface it after a few tries instead of burning the
            # multi-hour outage budget on it.  Slow no-progress exits
            # (upload/compile then backend error) keep the outage budget:
            # that's the tunnel-down signature.
            fast = runtime < args.fast_fail_seconds
            if fast and reclaim_grace:
                # we deleted a LIVE claim (--max-yield-seconds backstop);
                # the claimer may still physically hold the TPU, so a fast
                # launch failure here is 'chip still busy', not a code bug
                # — spending the 4-strike fast-fail budget on it killed a
                # legitimate >2h campaign in round 4 (ADVICE r4 #2)
                reclaim_busy += 1
                if reclaim_busy > args.max_launch_failures:
                    log(f"[supervise] giving up: chip still busy "
                        f"{reclaim_busy} launches after reclaim")
                    return rc if rc else 1
                log(f"[supervise] chip still busy after reclaim "
                    f"({reclaim_busy}; rc={rc}); retrying after "
                    f"{args.outage_backoff_seconds:.0f}s")
                time.sleep(args.outage_backoff_seconds)
                continue
            if fast and rc == last_fast_rc:
                fast_fails += 1
            else:
                fast_fails = 1 if fast else 0
            last_fast_rc = rc if fast else None
            if fast_fails >= 4:
                log(f"[supervise] giving up: {fast_fails} consecutive fast "
                    f"identical failures (rc={rc}) — deterministic bug, "
                    f"not an outage")
                return rc if rc else 1
            launch_fails += 1
            if launch_fails > args.max_launch_failures:
                log(f"[supervise] giving up: {launch_fails} launch failures")
                return rc if rc else 1
            log(f"[supervise] launch failure {launch_fails}/"
                f"{args.max_launch_failures} (rc={rc}, no progress); "
                f"retrying after {args.outage_backoff_seconds:.0f}s")
            time.sleep(args.outage_backoff_seconds)
            continue
        attempt += 1
        if attempt > args.max_restarts:
            break
        kind = "stall" if stalled else f"rc={rc}"
        log(f"[supervise] restart {attempt}/{args.max_restarts} ({kind}) "
            f"after {args.backoff_seconds:.0f}s backoff")
        time.sleep(args.backoff_seconds)
    log(f"[supervise] giving up after {args.max_restarts} restarts")
    return rc if rc else 1


if __name__ == "__main__":
    sys.exit(main())
