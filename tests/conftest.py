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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
