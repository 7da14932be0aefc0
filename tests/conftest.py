"""Test harness: run on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 test plan)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Pallas kernels run in interpreter mode on CPU (see coloc_tpu.ops.dispatch).
os.environ.setdefault("COLOC_TPU_INTERPRET", "1")

# The container's sitecustomize pre-imports jax (TPU backend registration)
# before conftest runs, so env vars alone are too late — override via config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    # regardless of which other tests ran before it
    return np.random.default_rng(0)
