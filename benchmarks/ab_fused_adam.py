"""Chip A/B: fused Pallas Adam apply vs the XLA optax chain (headline cfg).

Times the SAME measurement the bench headline uses — the 64-batch
device-resident lax.scan epoch runner, best-of-3 single-dispatch reps
(elision-proof; benchmarks/README.md methodology) — for
fused_adam="off" vs "pallas" at the faithful headline config
(256x144 bs32 SN+hinge bf16 compute, f32 Keras-exact Adam).

Usage: python benchmarks/ab_fused_adam.py [--nb 64] [--reps 3]
Prints one JSON line: {"off_ms": ..., "pallas_ms": ..., "delta_ms": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=32)
    args = ap.parse_args()

    import jax

    from imagegeneration_tpu.core.platform import (
        setup_compile_cache,
        tpu_compiler_options,
    )

    setup_compile_cache(jax)
    import jax.numpy as jnp

    from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
    from imagegeneration_tpu.parallel import dp
    from imagegeneration_tpu.train.sndcgan_step import (
        SNDCGANTrainConfig,
        init_state,
        make_epoch_runner,
    )

    bs, nb = args.batch_size, args.nb
    imgs = jax.device_put(
        np.random.default_rng(3).integers(
            0, 256, (bs * nb, 144, 256, 3), dtype=np.uint8
        )
    )
    perm = jax.device_put(
        np.random.default_rng(4).permutation(bs * nb)
        .reshape(nb, bs).astype(np.int32)
    )

    out = {}
    for mode in ("off", "pallas"):
        cfg = SNDCGANTrainConfig(
            model=SNDCGANConfig(
                image_size=(144, 256, 3), spectral_norm=True,
                dtype=jnp.bfloat16,
            ),
            batch_size=bs,
            loss="hinge",
            fused_adam=mode,
        )
        runner = dp.jit_epoch_runner(make_epoch_runner(cfg), mesh=None, n_data=2)
        state = init_state(cfg)
        t_compile = time.perf_counter()
        state, metrics = runner(state, imgs, perm)
        jax.block_until_ready(metrics)
        compile_s = time.perf_counter() - t_compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, metrics = runner(state, imgs, perm)
            jax.block_until_ready(metrics)
            best = min(best, time.perf_counter() - t0)
        out[f"{mode}_ms"] = round(best / nb * 1e3, 3)
        out[f"{mode}_steps_per_sec"] = round(nb / best, 3)
        out[f"{mode}_warm_s"] = round(compile_s, 1)
        print(f"[{mode}] {out[f'{mode}_ms']} ms/step "
              f"({out[f'{mode}_steps_per_sec']} steps/s)", flush=True)

    out["delta_ms"] = round(out["off_ms"] - out["pallas_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
