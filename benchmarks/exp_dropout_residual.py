"""Experiment: squeeze the remaining dropout overhead in the fused step.

Current state (see docs/STATUS.md round 2): u8-byte dropout = 48.6 ms/step
vs 40.1 ms dropout-free. Residual ~8.5 ms hypotheses: bool-mask packing
(u32 convert_reduce ops in the trace), mask layout copies, rng-in-autodiff
scheduling. Variants:

  A. baseline: BitDropout as shipped (custom-vjp recompute)
  B. remat-D: jax.checkpoint around the discriminator applies — recompute
     activations in backward instead of saving them (trades ~4.6 ms of
     trunk recompute per apply against residual traffic)
  C. no dropout (bound)

Usage: python benchmarks/exp_dropout_residual.py  (real TPU)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 32
ITERS = 25


def bench(label, make_cfg, wrap_disc=None):
    import jax
    import jax.numpy as jnp

    from imagegeneration_tpu.core.platform import setup_compile_cache

    setup_compile_cache(jax)  # host-fingerprinted (cross-host AOT safety)

    from imagegeneration_tpu.train.sndcgan_step import (
        init_state,
        make_train_step,
    )

    cfg = make_cfg()
    state = init_state(cfg)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    batch = jax.device_put(
        np.random.default_rng(0).integers(
            0, 256, (BATCH, 144, 256, 3), dtype=np.uint8
        )
    )
    for _ in range(3):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label}: {dt * 1e3:.2f} ms/step = {1 / dt:.2f} steps/s", flush=True)


def main() -> None:
    import jax.numpy as jnp

    from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
    from imagegeneration_tpu.train.sndcgan_step import SNDCGANTrainConfig

    def cfg(remat_d=False, **kw):
        model_kw = dict(
            image_size=(144, 256, 3), spectral_norm=True, dtype=jnp.bfloat16
        )
        model_kw.update(kw)
        return lambda: SNDCGANTrainConfig(
            model=SNDCGANConfig(**model_kw), batch_size=BATCH, loss="hinge",
            remat_d=remat_d,
        )

    bench("A u8-bitdropout", cfg())
    bench("B remat-D", cfg(remat_d=True))
    bench("C no-dropout bound", cfg(dropout_rate=0.0))
    bench("D remat-D no-dropout", cfg(remat_d=True, dropout_rate=0.0))


if __name__ == "__main__":
    main()
