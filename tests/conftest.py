"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding
(mesh/pjit/shard_map) is exercised without TPU hardware — the standard JAX
fake-backend trick (SURVEY.md §4). Must be set before jax is imported.
"""
import os

# Force CPU even when the session environment pins a TPU platform: tests need
# deterministic fp32 math and 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# The persistent compilation cache must stay OFF in the suite: the CLI
# smoke tests run entry-point mains in-process, whose
# enable_persistent_cache() would otherwise flip the global jax config
# for every later test — and this jaxlib SEGFAULTS inside
# compilation_cache.put_executable_and_time on some CPU executables
# (observed at test_packed_train_step_matches_module, round 4). The
# helper honors this env switch.
os.environ["DUCOSY_XLA_CACHE_DIR"] = "off"

import jax  # noqa: E402

# A sitecustomize may force an accelerator platform (jax_platforms="axon,cpu")
# after env vars are read; override through the config API as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
