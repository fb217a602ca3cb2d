"""Categorized device-time breakdown of the headline step from a real
jax.profiler trace.

profile_step.py times jitted sub-programs, which under the tunnel can be
distorted by dispatch elision; this tool instead traces N real steps and
aggregates the XLA device ops from the chrome-trace output by category
(convolution / matmul / rng+dropout / optimizer / batchnorm-reduce / copy /
other-elementwise), so optimization targets the measured line items
(VERDICT r2 weak #2: "Adam applies 7.5 ms, reduce fusions ~11 ms, layout
copies ~3 ms ... unattacked").

Usage: python benchmarks/trace_breakdown.py [--steps 10] [--family sndcgan]
Prints per-category ms/step and the top-15 single ops.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(family: str, fused_adam: str = "auto"):
    import jax
    import jax.numpy as jnp

    if family == "sndcgan":
        from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
        from imagegeneration_tpu.train.sndcgan_step import (
            SNDCGANTrainConfig,
            init_state,
            make_train_step,
        )

        cfg = SNDCGANTrainConfig(
            model=SNDCGANConfig(
                image_size=(144, 256, 3), spectral_norm=True, dtype=jnp.bfloat16
            ),
            batch_size=32,
            loss="hinge",
            fused_adam=fused_adam,
        )
        state = init_state(cfg)
        step = jax.jit(make_train_step(cfg), donate_argnums=0)
        batch = jax.device_put(
            np.random.default_rng(0).integers(0, 256, (32, 144, 256, 3), np.uint8)
        )
        return step, state, (batch,)
    if family == "wgan":
        from imagegeneration_tpu.models.wgan import WGANConfig
        from imagegeneration_tpu.train.wgan_step import (
            WGANTrainConfig,
            init_state,
            make_train_step,
        )

        cfg = WGANTrainConfig(
            model=WGANConfig(image_size=(144, 256, 3)), batch_size=32
        )
        state = init_state(cfg)
        step = jax.jit(make_train_step(cfg), donate_argnums=0)
        batch = jax.device_put(
            np.random.default_rng(0).integers(0, 256, (32, 144, 256, 3), np.uint8)
        )
        return step, state, (batch,)
    if family == "cyclegan":
        from imagegeneration_tpu.models.cyclegan import CycleGANConfig
        from imagegeneration_tpu.train.cyclegan_step import (
            CycleGANTrainConfig,
            init_state,
            make_train_step,
        )

        cfg = CycleGANTrainConfig(
            model=CycleGANConfig(image_size=(128, 128, 3)), batch_size=4
        )
        state = init_state(cfg)
        step = jax.jit(make_train_step(cfg), donate_argnums=0)
        rng = np.random.default_rng(0)
        bx = jax.device_put(rng.integers(0, 256, (4, 128, 128, 3), np.uint8))
        by = jax.device_put(rng.integers(0, 256, (4, 128, 128, 3), np.uint8))
        return step, state, (bx, by)
    raise ValueError(family)


CATEGORIES = (
    ("conv", re.compile(r"convolution|conv_general|%conv", re.I)),
    ("matmul", re.compile(r"\bdot\b|dot_general|matmul", re.I)),
    ("rng_dropout", re.compile(r"rng|bit-generator|bitcast-convert.*u8|threefry", re.I)),
    ("copy_layout", re.compile(r"^copy|transpose|bitcast(?!-convert.*u8)|reshape", re.I)),
    ("reduce", re.compile(r"reduce|all-reduce", re.I)),
    ("scatter_gather", re.compile(r"scatter|gather|dynamic-slice|dynamic-update", re.I)),
)


def categorize(name: str) -> str:
    for cat, pat in CATEGORIES:
        if pat.search(name):
            return cat
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--family", default="sndcgan")
    ap.add_argument("--fused-adam", default="auto",
                    help="sndcgan only: off/pallas/auto (A/B the fused "
                    "Pallas Adam apply's trace categories)")
    ap.add_argument("--outdir", default="/tmp/ig_trace")
    args = ap.parse_args()

    import jax

    from imagegeneration_tpu.core.platform import setup_compile_cache

    setup_compile_cache(jax)
    step, state, batches = build_step(args.family, args.fused_adam)

    for _ in range(3):
        state, m = step(state, *batches)
    jax.block_until_ready(m)

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        for _ in range(args.steps):
            state, m = step(state, *batches)
        jax.block_until_ready(m)

    traces = sorted(
        glob.glob(os.path.join(args.outdir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        print("no trace.json.gz produced", file=sys.stderr)
        sys.exit(1)
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", [])
    # Device lanes: pick pids whose process name mentions TPU/device XLA ops.
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower() or "XLA Op" in name
    }
    by_cat = defaultdict(float)
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0))  # microseconds
        # Skip whole-program envelope events: the jit fn's own span plus the
        # per-iteration step lanes the profiler names "0", "1", ... — both
        # double-count every HLO op inside them (they inflated "other" and
        # total by ~2x before this filter).
        if name.startswith("jit_") or "train_step" in name or name.isdigit():
            continue
        by_cat[categorize(name)] += dur
        by_op[name] += dur
        total += dur

    n = args.steps
    print(json.dumps({"family": args.family, "device_pids": len(device_pids),
                      "total_device_ms_per_step": round(total / 1e3 / n, 2)}))
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(json.dumps({"category": cat, "ms_per_step": round(us / 1e3 / n, 2)}))
    print("--- top ops ---")
    for name, us in sorted(by_op.items(), key=lambda kv: -kv[1])[:15]:
        print(json.dumps({"op": name[:120], "ms_per_step": round(us / 1e3 / n, 3)}))


if __name__ == "__main__":
    main()
