"""Headline benchmark: SNDCGAN fused train step throughput at 256x144.

Prints ONE JSON line:
  {"metric": "sndcgan_train_steps_per_sec_per_chip", "value": N,
   "unit": "steps/s", "vs_baseline": R, ...extras}

Baseline: the reference publishes no throughput numbers (BASELINE.md). The
anchor used for `vs_baseline` is a FLOP-model estimate of the reference's
eager-TF step on its GTX 1660 Super (6 GB, ~5 TFLOP/s fp32):
~6.6 TFLOP per batch-32 step (G fwd+bwd, D twice fwd+bwd) at <=25% eager
utilization => ~0.19 steps/s; rounded generously UP to 0.33 steps/s so the
reported ratio understates rather than overstates the speedup. See
benchmarks/README.md for the arithmetic.

Config matches BASELINE.json config 2: 256x144, spectral-norm D with fused
power iteration, hinge loss, bfloat16 compute, batch 32 — the full fused
train step (not just inference).
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_GPU_STEPS_PER_SEC = 0.33  # documented estimate, see module docstring
BATCH = 32
WARMUP = 3
ITERS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Persistent compile cache (harmless if the backend bypasses it).
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
    from imagegeneration_tpu.train.sndcgan_step import (
        SNDCGANTrainConfig,
        init_state,
        make_sampler,
        make_train_step,
    )

    cfg = SNDCGANTrainConfig(
        model=SNDCGANConfig(
            image_size=(144, 256, 3), spectral_norm=True, dtype=jnp.bfloat16
        ),
        batch_size=BATCH,
        loss="hinge",
    )
    state = init_state(cfg)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    batch = np.random.default_rng(0).integers(
        0, 256, (BATCH, 144, 256, 3), dtype=np.uint8
    )
    batch = jax.device_put(batch)

    for _ in range(WARMUP):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    steps_per_sec = ITERS / dt

    # Secondary: sampled images/sec (generator_output path, fixed z).
    sampler = jax.jit(make_sampler(cfg))
    z = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (BATCH, 128)), jnp.float32)
    imgs = sampler(state, z)
    jax.block_until_ready(imgs)
    # sampling is ~4ms/batch; use a long window so tunnel-dispatch jitter
    # doesn't dominate the secondary metric
    sample_iters = ITERS * 5
    t0 = time.perf_counter()
    for _ in range(sample_iters):
        imgs = sampler(state, z)
    jax.block_until_ready(imgs)
    sample_imgs_per_sec = sample_iters * BATCH / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "sndcgan_train_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / REF_GPU_STEPS_PER_SEC, 2),
                "batch_size": BATCH,
                "resolution": "256x144",
                "images_per_sec": round(steps_per_sec * BATCH, 1),
                "sampled_images_per_sec": round(sample_imgs_per_sec, 1),
                "device": str(jax.devices()[0].device_kind),
            }
        )
    )


if __name__ == "__main__":
    main()
