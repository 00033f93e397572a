"""Checkpointing — orbax-backed, preserving the reference's logical schema.

The reference torch.saves a flat dict {step, core, head, adapt_v, adapt_a,
vid_vae, aud_codec, opt, ema} (trainer.py:407-423) but its sampler looks for
different keys and silently loads nothing (SURVEY §2.12.3).  Here one schema
is written and read by BOTH train resume and the sampler:

    step/           int
    params/         {vid_vae, aud_codec, adapt_v, adapt_a, embed, core, head}
    opt_state/      optax state (omitted for inference restores)
    ema_core/       EMA shadow of params['core']

plus a tiny JSON sidecar with config echo for sanity checks.  The manager
keeps step-numbered directories; `latest_step()` provides the
"{experiment}_latest" semantics.  Unlike the reference there IS a resume path
(reference gap, SURVEY §5).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..utils.io import ensure_dir, load_json, save_json


class CheckpointManager:
    def __init__(self, ckpt_dir, max_to_keep: Optional[int] = None):
        self.dir = ensure_dir(ckpt_dir).resolve()
        self._mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    # ------------------------------------------------------------------

    def save(self, step: int, tree: Dict[str, Any], meta: Optional[Dict] = None,
             wait: bool = False) -> None:
        """Async by default (orbax background thread); `wait=True` flushes.

        Idempotent per step: a step that already exists (e.g. the periodic
        save raced the preemption/final save) is skipped, not an error."""
        step = int(step)
        if step in (self._mgr.all_steps() or []):
            if wait:
                self._mgr.wait_until_finished()
            return
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        if meta is not None:
            save_json(self.dir / f"meta_{step}.json", meta)
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None,
                template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.dir}")
        if template is not None:
            return self._mgr.restore(
                int(step), args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(int(step))

    def meta(self, step: int) -> Optional[Dict]:
        p = self.dir / f"meta_{int(step)}.json"
        return load_json(p) if p.exists() else None

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def state_to_tree(state) -> Dict[str, Any]:
    """TrainState -> checkpoint tree (host numpy)."""
    return jax.device_get(
        {
            "step": np.asarray(state.step),
            "params": state.params,
            "opt_state": state.opt_state,
            "ema_core": state.ema_core,
        }
    )


def params_only_tree(tree: Dict[str, Any], use_ema: bool = False) -> Dict[str, Any]:
    """Extract inference params; optionally swap in the EMA weights
    (the reference saved EMA weights but never applied them — SURVEY §2.12.7;
    we make EMA sampling available).  The EMA tree's own structure says
    what it shadows: `training.ema.scope: all` stores the full param tree
    (same top-level keys as params -> full swap); the default core scope
    stores only params['core']."""
    params = tree["params"]
    ema = tree.get("ema_core")
    if use_ema and ema:
        if set(ema) == set(params):  # scope: all
            return ema
        params = dict(params)
        params["core"] = ema
    return params


def cast_params_bf16(params: Dict[str, Any]) -> Dict[str, Any]:
    """fp32 leaves -> bf16 (inference-only: halves HBM weight traffic and
    removes per-use casts inside the scan samplers).  Non-fp32 leaves (ints,
    already-bf16) pass through.  The single definition used by
    sample_clip.build_components and bench.py so the benchmarked numerics
    are exactly the served numerics."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if getattr(x, "dtype", None) == jnp.float32 else x, params)
