"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4:
"jax on CPU makes single-host multi-device simulation free").

Note: this container's sitecustomize registers the `axon` TPU backend and
sets jax_platforms="axon,cpu" via jax.config (overriding the env var), so we
must force CPU through jax.config here, before any computation runs.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# the container bakes JAX_PLATFORMS=axon; the package honors an explicit
# env var over the sitecustomize config pin, so force BOTH env and config
# to cpu before anything imports the package
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs[:8]
