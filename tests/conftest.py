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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if os.environ.get("IMAGEGEN_CONFIG5") and "backend_optimization" not in flags:
    # The 512x288 full-resolution programs take >95 min to compile at the
    # default XLA:CPU optimization level on this 1-core host; level 1
    # compiles them in ~14 min and does not change numerics (the config-5
    # test is an exactness check, not a perf measurement). The collective
    # termination timeout must also be raised: 8 virtual devices time-share
    # ONE core here, so the spatial halo-exchange rendezvous (default 40 s)
    # fires before all shards reach it at full resolution.
    flags += (" --xla_backend_optimization_level=1"
              " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the fused GAN steps take minutes to compile on
# this 1-core host; repeat suite runs hit the cache instead. The directory
# is scoped by a host-CPU fingerprint — XLA:CPU AOT entries from a
# different machine load with only a warning and then SIGILL/abort
# (observed when the cache crossed rounds onto a lesser host).
from imagegeneration_tpu.core.platform import setup_compile_cache  # noqa: E402

setup_compile_cache(jax)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_image_size():
    """48x80 — divisible by 8 (generator) and big enough for the D avgpool."""
    return (48, 80, 3)
