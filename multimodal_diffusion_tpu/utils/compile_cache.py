"""Persistent XLA compilation cache setup.

First compile of the full train step / 50-step scan sampler costs minutes
on a remote-compile TPU setup (PERFORMANCE.md); enabling jax's persistent
compilation cache makes restarts (resume after preemption, repeated bench
runs, serving restarts) hit the disk cache instead.  Called by the train /
infer / serve CLIs; a no-op when the user already configured it.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

DEFAULT_DIR = os.environ.get(
    "MMDT_COMPILE_CACHE",
    str(Path.home() / ".cache" / "multimodal_diffusion_tpu" / "xla"),
)


def _host_fingerprint() -> str:
    """Stable fingerprint of the host CPU's ISA features.

    XLA:CPU cache entries are AOT-compiled for the *compiling* machine's
    feature set; loading them on a host with different features logs
    "could lead to execution errors such as SIGILL" per entry (observed
    when a container image ships a cache populated elsewhere).  Keying the
    cache directory by the feature set makes a foreign cache invisible
    instead of a hazard."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.machine().encode()).hexdigest()[:12]


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user-configured
    try:
        d = Path(cache_dir or DEFAULT_DIR) / _host_fingerprint()
        d.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(d))
        # cache every compile that takes noticeable time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail the run for it
