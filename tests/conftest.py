"""Test env: run JAX on CPU with 8 virtual devices so channel/time sharding
is exercised without a pod (SURVEY.md §4 'Implication for the build')."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

# jax may already have been imported by a pytest plugin, in which case the
# env var was read too early — force the config directly as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
