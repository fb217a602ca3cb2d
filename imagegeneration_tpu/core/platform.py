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
