"""Test configuration: force an 8-virtual-device CPU backend.

The environment may pre-register a TPU backend (JAX_PLATFORMS=axon via
sitecustomize) that grabs the single real chip and serializes every process;
tests must run on CPU so they are hermetic and can run alongside TPU jobs.
`jax.config.update` after import wins over the sitecustomize registration.

The 8 virtual CPU devices are the JAX-native "fake backend" for exercising
mesh/sharding code paths without TPU hardware (SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the fused GAN steps take minutes to compile on
# this 1-core host; repeat suite runs hit the cache instead.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_image_size():
    """48x80 — divisible by 8 (generator) and big enough for the D avgpool."""
    return (48, 80, 3)
