"""A/B the headline fused step under candidate XLA:TPU compiler options.

Options are passed per-jit via `jax.jit(compiler_options=...)` — on this
image the tunneled TPU compiler does NOT read the client's XLA_FLAGS env
(it lives in the server process), so per-jit options are the only channel
that verifiably reaches it (see core/platform.tpu_compiler_options).
Each candidate runs in its own subprocess with the persistent compile
cache redirected so every measurement compiles fresh. Unknown option keys
fail that candidate's compile and are reported as errors (cheap probing).
Winners get promoted into core/platform.py defaults; the sweep stays
checked in so the measurement is reproducible.

Usage: python benchmarks/sweep_flags.py  (real TPU, ~2 min per candidate)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CANDIDATES = {
    "baseline": {},
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "vmem128m": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
}

WORKER = r"""
import json, os, sys, time
import numpy as np
import jax, jax.numpy as jnp
from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
from imagegeneration_tpu.train.sndcgan_step import (
    SNDCGANTrainConfig, init_state, make_train_step)

opts = json.loads(os.environ["SWEEP_COMPILER_OPTIONS"]) or None
cfg = SNDCGANTrainConfig(
    model=SNDCGANConfig(image_size=(144, 256, 3), spectral_norm=True,
                        dtype=jnp.bfloat16),
    batch_size=32, loss="hinge")
state = init_state(cfg)
step = jax.jit(make_train_step(cfg), donate_argnums=0,
               compiler_options=opts)
batch = jax.device_put(
    np.random.default_rng(0).integers(0, 256, (32, 144, 256, 3), np.uint8))
for _ in range(3):
    state, m = step(state, batch)
jax.block_until_ready(m)
t0 = time.perf_counter()
N = 40
for _ in range(N):
    state, m = step(state, batch)
jax.block_until_ready(m)
print(json.dumps({"step_ms": round((time.perf_counter() - t0) / N * 1e3, 2)}))
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, opts in CANDIDATES.items():
        env = dict(os.environ)
        env["SWEEP_COMPILER_OPTIONS"] = json.dumps(opts)
        # The worker's explicit compiler_options must be the only source of
        # TPU options — disable the platform default so "baseline" is clean.
        env["IMAGEGEN_TPU_VMEM_KIB"] = ""
        # No persistent cache: each candidate must compile fresh so the
        # option actually applies.
        env["IMAGEGEN_JAX_CACHE"] = "/tmp/ig_flag_sweep_nocache_" + name
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        try:
            out = subprocess.run(
                [sys.executable, "-c", WORKER], env=env, cwd=repo,
                capture_output=True, text=True, timeout=900)
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            res = json.loads(line[-1]) if line else {"error": out.stderr[-300:]}
        except subprocess.TimeoutExpired:
            res = {"error": "timeout"}
        print(json.dumps({"candidate": name, "options": opts, **res}),
              flush=True)


if __name__ == "__main__":
    main()
