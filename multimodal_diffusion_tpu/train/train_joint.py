"""Joint A<->V training entrypoint.

    python -m multimodal_diffusion_tpu.train.train_joint \
        --config configs/mvp.yaml [overlay.yaml ...] [--resume] [--max-steps N]

Parity with the reference `avdiff/models/train/train_joint.py:40-75`
(multi-YAML merge, dataset construction, step loop, final checkpoint), with
the TPU-native launch model replacing torchrun/DDP env plumbing
(train_joint.py:28-37): a single program drives all local chips through the
mesh; multi-host runs call `jax.distributed.initialize()` (auto-detected via
the JAX coordination env) and shard the dataset per host.
"""

from __future__ import annotations

import argparse
import os
import jax

from ..datasets.av_manifest import AVClipsDataset
from ..datasets.collate import collate_batch
from ..datasets.loader import DataLoader
from ..utils.io import load_config
from .checkpoint import CheckpointManager, state_to_tree
from .metrics import MetricWriter
from .trainer import create_trainer, run_training


def maybe_init_distributed() -> None:
    """Multi-host init when a JAX coordinator is configured (no-op
    otherwise).  Replaces the reference's RANK/WORLD_SIZE + NCCL plumbing."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()


def main(argv=None):
    ap = argparse.ArgumentParser(description="Joint A<->V diffusion training")
    ap.add_argument("--config", type=str, nargs="+", required=True,
                    help="One or more YAML configs (merged left->right)")
    ap.add_argument("--resume", action="store_true",
                    help="Resume from the latest checkpoint in paths.ckpt_dir")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--device", type=str, default=None,
                    help="Backend override (cpu to force the CPU backend)")
    args = ap.parse_args(argv)

    if args.device and args.device.lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    maybe_init_distributed()
    cfg = load_config(*args.config)

    is_lead = jax.process_index() == 0

    # ---- data ----
    # pre-decoded record shards (tools/build_records.py) are the production
    # path: mmap reads, no JPEG decode in the hot loop
    records = cfg["data"].get("records_dir")
    if records:
        from ..datasets.records import RecordDataset

        dataset = RecordDataset(
            records,
            device_preprocess=bool(cfg["data"].get("device_preprocess", True)),
        )
    else:
        manifest = cfg["data"]["train_split_glob"]
        dataset = AVClipsDataset(
            manifest_path=manifest,
            clip_seconds=float(cfg["data"]["clip_seconds"]),
            fps=int(cfg["video"]["fps"]),
            sr=int(cfg["audio"]["sr"]),
            size_hw=tuple(cfg["video"]["size"]),
            video_root=cfg.get("paths", {}).get("video_root"),
            audio_root=cfg.get("paths", {}).get("audio_root"),
            device_preprocess=bool(cfg["data"].get("device_preprocess", False)),
        )
    T_target = dataset.T
    L_target = dataset.L

    bundle = create_trainer(cfg)
    global_batch = bundle.latent_shapes["video"][0]
    resident = bool(cfg["data"].get("device_resident", False)) and records
    if resident:
        # corpus fits in HBM: upload once, gather batches on-device — zero
        # per-step host transfer (essential on tunneled/low-bandwidth hosts;
        # see datasets/records.device_resident_batches)
        from ..datasets.records import device_resident_batches

        loader = device_resident_batches(
            dataset, bundle.mesh, global_batch, seed=int(cfg.get("seed", 0)),
            max_clips=cfg["data"].get("resident_max_clips"))
    else:
        loader = DataLoader(
            dataset,
            batch_size=global_batch,
            collate_fn=lambda items: collate_batch(items, T_target, L_target),
            shuffle=True,
            drop_last=True,
            num_workers=int(cfg["data"].get("num_workers", 2)) or 2,
            prefetch=int(cfg["data"].get("prefetch_factor", 2)),
            seed=int(cfg.get("seed", 0)),
            shard_id=jax.process_index(),
            num_shards=jax.process_count(),
        )
    print(f"[data] {len(dataset)} clips; global batch {global_batch}; "
          f"mesh {dict(bundle.mesh.shape)}; "
          f"{'device-resident' if resident else 'streamed'} input")

    # ---- logging / checkpoints (lead host only) ----
    writer = MetricWriter(cfg["paths"]["log_dir"]) if is_lead else None
    ckpt = CheckpointManager(cfg["paths"]["ckpt_dir"]) if is_lead else None

    if args.resume and ckpt is not None and ckpt.latest_step() is not None:
        import numpy as np
        from ..parallel.sharding import replicated

        tree = ckpt.restore(template=state_to_tree(bundle.state))
        bundle.state = bundle.state.replace(
            step=jax.numpy.asarray(int(tree["step"]), jax.numpy.int32),
            params=jax.device_put(tree["params"]),
            opt_state=jax.device_put(tree["opt_state"]),
            ema_core=jax.device_put(tree["ema_core"]),
        )
        print(f"[resume] restored step {int(tree['step'])} from {ckpt.dir}")

    def log_fn(step, metrics):
        if writer is not None:
            writer.write(step, metrics)
        print(f"step {step}: " + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))

    # async saves overlap the orbax device-pull with live training — the
    # right default on real pods, but on a tunneled chip the concurrent
    # device_get + step dispatches can wedge the link; ckpt_async: false
    # serializes each save (training pauses ~seconds per checkpoint).
    ckpt_async = bool(cfg["training"].get("ckpt_async", True))

    def ckpt_fn(step, state):
        if ckpt is not None:
            ckpt.save(step, state_to_tree(state),
                      meta={"experiment": cfg.get("experiment", "")},
                      wait=not ckpt_async)

    # validation (the reference parsed val_every but wired no val loop)
    val_fn = None
    val_manifest = cfg["data"].get("val_split_glob")
    if val_manifest and int(cfg["training"].get("val_every", 0) or 0) > 0:
        from .trainer import run_validation

        val_ds = AVClipsDataset(
            manifest_path=val_manifest,
            clip_seconds=float(cfg["data"]["clip_seconds"]),
            fps=int(cfg["video"]["fps"]),
            sr=int(cfg["audio"]["sr"]),
            size_hw=tuple(cfg["video"]["size"]),
            video_root=cfg.get("paths", {}).get("video_root"),
            audio_root=cfg.get("paths", {}).get("audio_root"),
            device_preprocess=bool(cfg["data"].get("device_preprocess", False)),
        )
        val_loader = DataLoader(
            val_ds, batch_size=global_batch,
            collate_fn=lambda items: collate_batch(items, T_target, L_target),
            shuffle=False, drop_last=True,
            num_workers=int(cfg["data"].get("num_workers", 2)) or 2,
        )

        def val_fn(step, state):
            metrics = run_validation(bundle, val_loader.epoch(0), n_batches=8,
                                     params=state.params)
            if writer is not None:
                writer.write(step, metrics)
            print(f"step {step}: " + " ".join(
                f"{k}={v:.4f}" for k, v in metrics.items()))

    # Preemption resilience: SIGTERM/SIGINT request a clean stop; the loop
    # exits after the in-flight step and the final checkpoint below flushes
    # synchronously before the process dies.
    import signal

    stop_requested = {"v": False}
    loop_started = {"v": False}

    def _request_stop(signum, frame):
        if not loop_started["v"] or stop_requested["v"]:
            # Nothing to checkpoint yet (still in corpus upload / compile —
            # the stop flag is only polled inside the train loop, so a
            # deferred stop would hang for minutes), or a second signal:
            # exit now.  SystemExit propagates at the next Python bytecode
            # boundary, i.e. after the in-flight device call returns.
            print(f"[preempt] signal {signum} before first step (or "
                  f"repeated); exiting immediately")
            raise SystemExit(1)
        stop_requested["v"] = True
        print(f"[preempt] signal {signum} received; will checkpoint and exit")

    def _should_stop():
        loop_started["v"] = True
        return stop_requested["v"]

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _request_stop)
        except ValueError:  # not the main thread (e.g. under a test runner)
            pass

    try:
        state = run_training(
            cfg, bundle, iter(loader),
            max_steps=args.max_steps,
            log_fn=log_fn, checkpoint_fn=ckpt_fn, val_fn=val_fn,
            should_stop=_should_stop,
        )
    finally:
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)

    if ckpt is not None:
        ckpt.save(int(state.step), state_to_tree(state),
                  meta={"experiment": cfg.get("experiment", ""), "final": True},
                  wait=True)
        ckpt.close()
        print(f"[done] step {int(state.step)}; checkpoints in {ckpt.dir}")
    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()
