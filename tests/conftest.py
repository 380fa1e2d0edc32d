"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware
(SURVEY.md §4 implication (e)).

NOTE: this environment force-registers a TPU ('axon') backend via
sitecustomize and JAX_PLATFORMS=axon, so plain env vars are not enough —
we override through jax.config before any backend is initialized."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
