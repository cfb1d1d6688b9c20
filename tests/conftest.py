"""Test configuration: force a virtual 8-device CPU mesh so sharding tests
run without TPU hardware, per the project testing strategy (SURVEY.md §4).

NOTE: this environment's TPU plugin registers itself at interpreter start
(sitecustomize) and overrides JAX_PLATFORMS from the environment, so the env
var alone is not enough — we must override jax_platforms via jax.config
after import, before first backend use.
"""

import os
import sys
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# CPU test runs must NOT load persistent-cache executables: entries
# produced through the axon remote-compile service are built with CPU
# features (+prefer-no-scatter/+prefer-no-gather tuning against a newer
# ISA) this host lacks, and intermittently abort/SIGILL mid-suite.
os.environ["JAX_COMPILATION_CACHE_DIR"] = ""

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound the suite's memory: XLA CPU keeps every compiled executable
    and its constants alive; on this 2-CPU / limited-RAM box the
    accumulated footprint segfaults native allocations late in the suite.
    Dropping compiled programs between modules trades recompiles for a
    bounded high-water mark."""
    yield
    jax.clear_caches()
    gc.collect()
