"""Platform selection honoring the user's explicit environment request.

Some hosts force-register an accelerator backend via sitecustomize and
override `JAX_PLATFORMS` from the environment (observed on this machine's
tunneled-TPU image: a user running `JAX_PLATFORMS=cpu <cli>` still lands on
the TPU). Calling `honor_env_platform()` before any JAX device use restores
the documented env-var semantics: if the environment names platforms, that
exact list wins.
"""

from __future__ import annotations

import os


def honor_env_platform() -> None:
    env = os.environ.get("JAX_PLATFORMS", "").strip()
    if not env:
        return
    import jax

    if str(jax.config.jax_platforms or "") != env:
        jax.config.update("jax_platforms", env)


def compile_cache_dir(root: str = "/root/repo/.jax_cache") -> str:
    """Host-fingerprinted persistent-compile-cache directory.

    jax's compilation cache key does not fully capture the CPU feature set
    the XLA:CPU AOT code was compiled for; an entry produced on a host with
    e.g. +prefer-no-scatter loads on a lesser host with only a warning and
    then dies with SIGILL/abort mid-execution (observed when this repo's
    cache crossed rounds onto a different machine). Scoping the cache by a
    hash of the host's CPU flags makes stale cross-host entries unreachable.
    """
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(
                (line for line in f if line.startswith("flags")), ""
            )
    except OSError:
        flags = os.uname().machine
    tag = hashlib.sha256(flags.encode()).hexdigest()[:12]
    path = os.path.join(root, tag)
    os.makedirs(path, exist_ok=True)
    return path


def setup_compile_cache(jax) -> None:
    """Point jax's persistent compile cache at the host-scoped directory."""
    jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
