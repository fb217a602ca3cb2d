"""Measure the REFERENCE's eager train step by running its code as-is.

BASELINE.md: the reference publishes no throughput numbers, so the baseline
"must be measured by running the reference (or a faithful re-timing)". This
script imports /root/reference/sndcgan/SNDCGAN.py via sys.path, instantiates
its actual training class, and times its actual eager `train_step`
(SNDCGAN.py:241-269) on this host's CPU — then times OUR fused jitted step on
the SAME CPU at the same shapes/config (f32, BCE, dropout 0.5: the reference's
faithful configuration, not the bf16+hinge TPU headline) for a same-host,
same-device, same-semantics comparison with no hardware extrapolation in it.

Writes benchmarks/reference_timing.json; bench.py surfaces the numbers next to
the TPU headline. The reference's own GPU (GTX 1660 Super, README.md:15) is
not available anywhere we can reach, so the GPU anchor in bench.py remains a
FLOP-model extrapolation — now sanity-checked against these measurements.

Usage: python benchmarks/time_reference.py  (CPU-only; ~10-20 min on 1 core)
"""

from __future__ import annotations

import json
import os
import platform
import sys
import time
from pathlib import Path

REF_SNDCGAN = "/root/reference/sndcgan"
OUT = Path(__file__).with_name("reference_timing.json")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

# (name, H, W, batch) — headline matches sndcgan/Trainer.py:5-7 (144x256) with
# the FID-default batch 32; tiny is the cross-check shape used by the parity
# tests.
CONFIGS = [("tiny_48x80_bs4", 48, 80, 4), ("headline_256x144_bs32", 144, 256, 32)]
STEP_BUDGET_S = 240.0  # per measurement target
MAX_STEPS = 30


def _timed_loop(step_once, budget_s: float, max_steps: int) -> tuple[float, int]:
    """Run step_once until the time budget or max_steps; return (s/step, n)."""
    t0 = time.perf_counter()
    n = 0
    while n < max_steps:
        step_once()
        n += 1
        if time.perf_counter() - t0 > budget_s:
            break
    return (time.perf_counter() - t0) / n, n


def time_reference() -> dict:
    sys.path.insert(0, REF_SNDCGAN)
    import numpy as np
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    import SNDCGAN as ref

    results = {}
    for name, h, w, batch in CONFIGS:
        rng = np.random.default_rng(0)
        data_dir = Path(f"/tmp/ref_timing_data_{h}x{w}/landscape")
        data_dir.mkdir(parents=True, exist_ok=True)
        for i in range(4):
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            tf.io.write_file(str(data_dir / f"i{i}.png"), tf.io.encode_png(img))
        gan = ref.SNDCGAN(
            dir_path=f"/tmp/ref_timing_run_{h}x{w}",
            dataset=str(data_dir.parent),
            batch_size=batch,
            dropout=0.5,  # sndcgan/Trainer.py:22 default
            learning_rate_disc=2e-4,
            learning_rate_gen=2e-4,
            live_output="/tmp/ref_timing_live",
            continue_=False,
            image_size=(h, w, 3),
            z_size=128,
        )
        real = tf.constant(
            rng.uniform(-1, 1, (batch, h, w, 3)).astype(np.float32)
        )
        z = tf.constant(rng.uniform(-1, 1, (batch, 128)).astype(np.float32))
        gan.train_step(real, z)  # warmup (kernel/autotune init)
        sec_per_step, n = _timed_loop(
            lambda: gan.train_step(real, z), STEP_BUDGET_S, MAX_STEPS
        )
        results[name] = {
            "steps_per_sec": round(1.0 / sec_per_step, 4),
            "sec_per_step": round(sec_per_step, 4),
            "steps_timed": n,
        }
        print(f"reference  {name}: {results[name]}", flush=True)
    return results


def time_ours_cpu() -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon
    import jax.numpy as jnp
    import numpy as np

    from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
    from imagegeneration_tpu.train.sndcgan_step import (
        SNDCGANTrainConfig,
        init_state,
        make_train_step,
    )

    results = {}
    for name, h, w, batch in CONFIGS:
        cfg = SNDCGANTrainConfig(
            model=SNDCGANConfig(image_size=(h, w, 3), dtype=jnp.float32),
            batch_size=batch,
            loss="bce",
        )
        state = init_state(cfg)
        step = jax.jit(make_train_step(cfg), donate_argnums=0)
        batch_u8 = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (batch, h, w, 3), np.uint8)
        )
        state, m = step(state, batch_u8)  # compile + warmup
        jax.block_until_ready(m)

        holder = {"state": state}

        def once():
            holder["state"], metrics = step(holder["state"], batch_u8)
            jax.block_until_ready(metrics)

        sec_per_step, n = _timed_loop(once, STEP_BUDGET_S, MAX_STEPS)
        results[name] = {
            "steps_per_sec": round(1.0 / sec_per_step, 4),
            "sec_per_step": round(sec_per_step, 4),
            "steps_timed": n,
        }
        print(f"ours (cpu) {name}: {results[name]}", flush=True)
    return results


def main() -> None:
    ref = time_reference()
    # Persist the (expensive) reference numbers before timing ours, so a
    # failure in the second phase can't lose them.
    OUT.write_text(json.dumps({"reference_tf_cpu": ref}, indent=2) + "\n")
    ours = time_ours_cpu()
    doc = {
        "measured_on": {
            "host_cpu": platform.processor() or platform.machine(),
            "n_cores": os.cpu_count(),
            "date": "2026-08-16",
            "tf_version": __import__("tensorflow").__version__,
            "note": (
                "Reference executed as-is from /root/reference/sndcgan via "
                "sys.path (eager train_step, SNDCGAN.py:241-269). Same-host "
                "CPU comparison in the reference's faithful config (f32, "
                "BCE, dropout 0.5). The reference's GTX 1660 Super is not "
                "reachable; GPU anchors remain FLOP-model extrapolations."
            ),
        },
        "reference_tf_cpu": ref,
        "ours_jax_cpu": ours,
        "same_host_speedup": {
            k: round(ours[k]["steps_per_sec"] / ref[k]["steps_per_sec"], 2)
            for k in ref
        },
    }
    OUT.write_text(json.dumps(doc, indent=2) + "\n")
    print(json.dumps(doc["same_host_speedup"]))


if __name__ == "__main__":
    main()
