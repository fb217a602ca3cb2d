"""Decompose the WGAN and CycleGAN step costs on the real chip.

VERDICT r2 weak #3: the WGAN and CycleGAN fused steps had never been
profiled, and round-1's ad-hoc WGAN table number (31.4 steps/s,
benchmarks/README.md) disagreed with round-2's driver-run bench.py number
(22.634) with nothing explaining the delta. This probe times the actual
cost structure so the discrepancy is reconciled from measurements, not
guesses:

WGAN (reference config: 144x256 bs32 n_critic=5, f32, weight clip):
  - full fused step, steady-state cadence (the bench.py measurement)
  - the two sub-programs the lax.cond switches between: skip-branch step
    (2 critic updates only) and gan-branch step (+ combined-model update),
    measured by pinning critic_count
  - dtype A/B: bf16 model compute (not the faithful config; shows whether
    round-1's 31.4 could have been a bf16 run)
  - scan-amortized epoch runner (resident path) vs per-step dispatch

CycleGAN (reference config: 128x128 bs4, 9 res blocks, f32):
  - full fused 4-update step, Pallas IN vs XLA IN
  - generator fwd, generator fwd+bwd, discriminator fwd+bwd sub-programs

Usage: python benchmarks/profile_families.py  (real TPU, several minutes)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 20


def _time_step(jax, step, state, *args, iters=ITERS):
    s = state
    for _ in range(3):
        s, m = step(s, *args)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        s, m = step(s, *args)
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def profile_wgan(results: dict) -> None:
    import jax
    import jax.numpy as jnp

    from imagegeneration_tpu.models.wgan import WGANConfig
    from imagegeneration_tpu.train.wgan_step import (
        WGANTrainConfig,
        init_state,
        make_train_step,
    )

    def probe(name, ms):
        results[name] = round(ms, 2)
        print(json.dumps({name: results[name]}), flush=True)

    B = 32
    batch = jax.device_put(
        np.random.default_rng(0).integers(0, 256, (B, 144, 256, 3), np.uint8)
    )

    def build(dtype=jnp.float32, n_critic=5):
        cfg = WGANTrainConfig(
            model=WGANConfig(image_size=(144, 256, 3), dtype=dtype),
            batch_size=B, n_critic=n_critic,
        )
        return cfg, init_state(cfg)

    # Steady-state cadence (what bench.py measures): counter cycles 1..5.
    cfg, state = build()
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    probe("wgan_step_cadence_ms", _time_step(jax, step, state, batch))

    # Skip-branch only: huge n_critic so do_gan never fires.
    cfg_s, state_s = build(n_critic=10**6)
    step_s = jax.jit(make_train_step(cfg_s), donate_argnums=0)
    probe("wgan_step_skipbranch_ms", _time_step(jax, step_s, state_s, batch))

    # Gan-branch every step: n_critic=1.
    cfg_g, state_g = build(n_critic=1)
    step_g = jax.jit(make_train_step(cfg_g), donate_argnums=0)
    probe("wgan_step_ganbranch_ms", _time_step(jax, step_g, state_g, batch))

    # bf16 A/B (NOT the faithful config).
    cfg_b, state_b = build(dtype=jnp.bfloat16)
    step_b = jax.jit(make_train_step(cfg_b), donate_argnums=0)
    probe("wgan_step_cadence_bf16_ms", _time_step(jax, step_b, state_b, batch))

    # Scan-amortized resident path: one epoch of 20 batches in one program.
    from imagegeneration_tpu.train.wgan_step import make_epoch_runner

    cfg_r, state_r = build()
    nb = 20
    images = jax.device_put(
        np.random.default_rng(1).integers(0, 256, (B * 4, 144, 256, 3), np.uint8)
    )
    perm = jnp.asarray(
        np.random.default_rng(2).integers(0, B * 4, (nb, B))
    )
    run = jax.jit(make_epoch_runner(cfg_r), donate_argnums=0)
    state_r, m = run(state_r, images, perm)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    state_r, m = run(state_r, images, perm)
    jax.block_until_ready(m)
    probe("wgan_scan_per_step_ms", (time.perf_counter() - t0) / nb * 1e3)


def profile_cyclegan(results: dict) -> None:
    import jax
    import jax.numpy as jnp

    from imagegeneration_tpu.models.cyclegan import CycleGANConfig, make_models
    from imagegeneration_tpu.train.cyclegan_step import (
        CycleGANTrainConfig,
        init_state,
        make_train_step,
    )

    def probe(name, ms):
        results[name] = round(ms, 2)
        print(json.dumps({name: results[name]}), flush=True)

    B = 4
    rng = np.random.default_rng(0)
    bx = jax.device_put(rng.integers(0, 256, (B, 128, 128, 3), np.uint8))
    by = jax.device_put(rng.integers(0, 256, (B, 128, 128, 3), np.uint8))

    for label, backend in (("pallas", "auto"), ("xla", "xla")):
        cfg = CycleGANTrainConfig(
            model=CycleGANConfig(image_size=(128, 128, 3), in_backend=backend),
            batch_size=B,
        )
        state = init_state(cfg)
        step = jax.jit(make_train_step(cfg), donate_argnums=0)
        probe(f"cyclegan_step_{label}_ms", _time_step(jax, step, state, bx, by))

    # Sub-programs (default backend).
    cfg = CycleGANTrainConfig(
        model=CycleGANConfig(image_size=(128, 128, 3)), batch_size=B
    )
    state = init_state(cfg)
    gg, _, dx, _ = make_models(cfg.model)
    x = jnp.asarray(rng.uniform(-1, 1, (B, 128, 128, 3)), jnp.float32)

    g_fwd = jax.jit(lambda p, x: gg.apply({"params": p}, x))
    out = g_fwd(state.gg_params, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = g_fwd(state.gg_params, x)
    jax.block_until_ready(out)
    probe("cyclegan_g_fwd_ms", (time.perf_counter() - t0) / ITERS * 1e3)

    g_bwd = jax.jit(
        jax.grad(lambda p, x: jnp.sum(gg.apply({"params": p}, x).astype(jnp.float32)))
    )
    out = g_bwd(state.gg_params, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = g_bwd(state.gg_params, x)
    jax.block_until_ready(out)
    probe("cyclegan_g_fwdbwd_ms", (time.perf_counter() - t0) / ITERS * 1e3)

    d_bwd = jax.jit(
        jax.grad(lambda p, x: jnp.sum(dx.apply({"params": p}, x).astype(jnp.float32)))
    )
    out = d_bwd(state.dx_params, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = d_bwd(state.dx_params, x)
    jax.block_until_ready(out)
    probe("cyclegan_d_fwdbwd_ms", (time.perf_counter() - t0) / ITERS * 1e3)


def main() -> None:
    import jax

    from imagegeneration_tpu.core.platform import setup_compile_cache

    setup_compile_cache(jax)
    results: dict = {}
    profile_wgan(results)
    profile_cyclegan(results)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
