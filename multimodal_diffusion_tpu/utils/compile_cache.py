"""Persistent XLA compilation cache setup.

First compile of the full train step / 50-step scan sampler costs minutes
on a remote-compile TPU setup (PERFORMANCE.md); enabling jax's persistent
compilation cache makes restarts (resume after preemption, repeated bench
runs, serving restarts) hit the disk cache instead.  Called by the train /
infer / serve CLIs; a no-op when the user already configured it.
"""

from __future__ import annotations

import os
from pathlib import Path

DEFAULT_DIR = os.environ.get(
    "MMDT_COMPILE_CACHE",
    str(Path.home() / ".cache" / "multimodal_diffusion_tpu" / "xla"),
)


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user-configured
    try:
        d = Path(cache_dir or DEFAULT_DIR)
        d.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(d))
        # cache every compile that takes noticeable time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail the run for it
