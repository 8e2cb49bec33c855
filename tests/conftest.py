"""Test harness configuration.

Tests always run on the CPU backend with 8 virtual XLA devices so multi-chip
sharding logic is exercised without TPU hardware — the technique the driver
also uses for the multichip dry run (see __graft_entry__.dryrun_multichip).
FP64 is enabled because the oracle solver and the FP64-reduction contract
need it.

Must run before jax initializes, hence the env mutation at import time.
"""

import os

# The environment pre-sets JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize imports jax at interpreter start, so env vars alone are too
# late — the config must be updated through the already-imported jax.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture
def data_dir() -> str:
    return DATA_DIR


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(42)
