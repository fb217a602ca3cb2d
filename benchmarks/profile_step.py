"""Decompose the headline SNDCGAN step cost on the real chip.

Times jitted sub-programs of the fused step (G fwd, G fwd+bwd, D fwd, D
fwd+bwd, full step with/without dropout, d_updates=1) so optimization work
targets the actual bottleneck instead of guesses. One JSON line per probe.

Usage: python benchmarks/profile_step.py  (real TPU, ~3 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 32
ITERS = 20


def _time(jax, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3  # ms


def main() -> None:
    import jax
    import jax.numpy as jnp

    from imagegeneration_tpu.core.platform import setup_compile_cache

    setup_compile_cache(jax)  # host-fingerprinted (cross-host AOT safety)

    from imagegeneration_tpu.models.sndcgan import SNDCGANConfig, make_models
    from imagegeneration_tpu.train.sndcgan_step import (
        SNDCGANTrainConfig,
        init_state,
        make_train_step,
    )

    results = {}

    def probe(name, ms):
        results[name] = round(ms, 2)
        print(json.dumps({name: results[name]}), flush=True)

    def build(dropout=0.5, d_updates=2):
        cfg = SNDCGANTrainConfig(
            model=SNDCGANConfig(
                image_size=(144, 256, 3), spectral_norm=True,
                dtype=jnp.bfloat16, dropout_rate=dropout,
            ),
            batch_size=BATCH,
            loss="hinge",
            d_updates=d_updates,
        )
        return cfg, init_state(cfg)

    cfg, state = build()
    gen, disc = make_models(cfg.model)
    rng = np.random.default_rng(0)
    batch = jax.device_put(
        rng.integers(0, 256, (BATCH, 144, 256, 3), dtype=np.uint8)
    )
    x = jnp.asarray(rng.uniform(-1, 1, (BATCH, 144, 256, 3)), jnp.bfloat16)
    z = jnp.asarray(rng.uniform(-1, 1, (BATCH, 128)), jnp.float32)
    dk = jax.random.key(0)

    # --- generator forward / fwd+bwd
    g_vars = {"params": state.g_params, "batch_stats": state.g_batch_stats}
    g_fwd = jax.jit(lambda v, z: gen.apply(v, z, train=False))
    probe("g_fwd_ms", _time(jax, g_fwd, g_vars, z))

    def g_loss(params):
        out, _ = gen.apply(
            {"params": params, "batch_stats": state.g_batch_stats},
            z, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32))

    g_bwd = jax.jit(jax.grad(g_loss))
    probe("g_fwdbwd_ms", _time(jax, g_bwd, state.g_params))

    # --- discriminator forward / fwd+bwd (train mode incl dropout + SN)
    d_vars = {"params": state.d_params, "spectral": state.d_spectral}

    d_fwd = jax.jit(
        lambda v, x: disc.apply(
            v, x, train=True, update_sn=False, rngs={"dropout": dk}
        )
    )
    probe("d_fwd_ms", _time(jax, d_fwd, d_vars, x))

    def d_loss(params):
        logits = disc.apply(
            {"params": params, "spectral": state.d_spectral},
            x, train=True, update_sn=False, rngs={"dropout": dk},
        )
        return jnp.sum(logits)

    d_bwd = jax.jit(jax.grad(d_loss))
    probe("d_fwdbwd_ms", _time(jax, d_bwd, state.d_params))

    # --- full fused steps
    for name, dropout, d_updates in (
        ("step_ms", 0.5, 2),
        ("step_nodrop_ms", 0.0, 2),
        ("step_dupd1_ms", 0.5, 1),
    ):
        c, s = build(dropout=dropout, d_updates=d_updates)
        step = jax.jit(make_train_step(c), donate_argnums=0)
        s, m = step(s, batch)
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s, m = step(s, batch)
        jax.block_until_ready(m)
        probe(name, (time.perf_counter() - t0) / ITERS * 1e3)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
