"""Throughput sweep over batch size / dtype / loss mode on the real chip.

Prints one JSON line per configuration. Used to pick the headline bench shape
and to track optimization work; bench.py stays the single-line driver metric.

Usage: python benchmarks/sweep.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(
    cfg_kwargs: dict, batch_size: int, iters: int = 12,
    image_size=(144, 256, 3),
) -> dict:
    import jax
    import jax.numpy as jnp

    from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
    from imagegeneration_tpu.train.sndcgan_step import (
        SNDCGANTrainConfig,
        init_state,
        make_train_step,
    )

    loss = cfg_kwargs.pop("loss", "bce")
    cfg = SNDCGANTrainConfig(
        model=SNDCGANConfig(image_size=image_size, **cfg_kwargs),
        batch_size=batch_size,
        loss=loss,
    )
    state = init_state(cfg)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    h, w, c = image_size
    batch = jax.device_put(
        np.random.default_rng(0).integers(
            0, 256, (batch_size, h, w, c), dtype=np.uint8
        )
    )
    for _ in range(3):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / iters
    return {
        "batch": batch_size,
        "resolution": f"{w}x{h}",
        "loss": loss,
        "sn": cfg.model.spectral_norm,
        "dtype": str(cfg.model.dtype.__name__ if hasattr(cfg.model.dtype, "__name__") else cfg.model.dtype),
        "step_ms": round(dt * 1e3, 2),
        "steps_per_sec": round(1.0 / dt, 2),
        "images_per_sec": round(batch_size / dt, 1),
    }


def main() -> None:
    import jax.numpy as jnp

    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument(
        "--config5", action="store_true",
        help="single-chip feasibility/bench run of BASELINE config 5's "
        "512x288 resolution (memory headroom + steps/s)",
    )
    args = parser.parse_args()

    if args.config5:
        for bsz in (8, 16, 32):
            print(
                json.dumps(
                    measure(
                        dict(spectral_norm=True, dtype=jnp.bfloat16,
                             loss="hinge"),
                        bsz,
                        image_size=(288, 512, 3),
                    )
                ),
                flush=True,
            )
        return

    configs = [
        (dict(spectral_norm=True, dtype=jnp.bfloat16, loss="hinge"), 32),
        (dict(spectral_norm=True, dtype=jnp.bfloat16, loss="hinge"), 64),
        (dict(spectral_norm=True, dtype=jnp.bfloat16, loss="hinge"), 128),
        (dict(spectral_norm=False, dtype=jnp.bfloat16, loss="bce"), 32),
        (dict(spectral_norm=True, dtype=jnp.float32, loss="hinge"), 32),
    ]
    if args.quick:
        configs = configs[:1]
    for kwargs, bsz in configs:
        print(json.dumps(measure(dict(kwargs), bsz)), flush=True)


if __name__ == "__main__":
    main()
