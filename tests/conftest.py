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


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_programs():
    """Drop jax's compiled-executable caches after every test module.

    Root cause (r4, measured with a per-test /proc/self/maps monitor):
    one serial full-suite process accumulates the memory MAPPINGS of
    every LLVM-JIT'd executable jax keeps alive — ~63,600 maps by
    test_wcpagc vs the kernel's vm.max_map_count default of 65,530 —
    and the next big XLA compile's mmap fails, segfaulting the
    interpreter (the 'Fatal Python error' aborts always landed in a
    late-suite compile: webui in r3, wcpagc in r4).  Clearing per
    module keeps the suite at a few thousand maps; modules recompile
    their own programs anyway.
    """
    yield
    import jax

    jax.clear_caches()
