"""CycleGAN real-scale training validation.

Rounds 1-4 validated SNDCGAN (100-epoch FID trends, 2-seed stability study)
and WGAN (100-epoch FID trend, docs/wgan_scale_results.md) at real scale;
CycleGAN's quality story was a 6-epoch PD trend from round 1. This closes
the gap: a 100-epoch run at the reference's faithful config (128x128,
9 res blocks, 4 simultaneous Adam(2e-4, beta1=0.5) updates per step —
cyclegan/Trainer.py:5, CycleGAN.py:229-233,325-382) on a synthetic unpaired
translation task with a KNOWN ground-truth mapping.

Task: domain A = synthetic landscapes (benchmarks/synth_landscapes.py);
domain B = color-INVERTED landscapes generated from DIFFERENT seeds — the
domains are unpaired (no image in B is the inversion of an image in A), but
the true A->B mapping is x -> -x in [-1,1] space. That gives metrics the
reference never had, evaluated per export on HELD-OUT images:

- oracle translation MAE: mean |G_g(x) - invert(x)|  (and G_f on B),
  i.e. distance to the unique ground-truth translation;
- cycle MAE: mean |G_f(G_g(x)) - x|  (the 10*L1 objective's own quantity,
  but on held-out data);
- PD-to-target: the reference's VGG16 perception-distance metric
  (cyclegan/generator_evaluation.py:38-45; fixed-seed random VGG features —
  no imagenet weights in this zero-egress environment, documented delta in
  evalx/pd.py) between G_g(x) and the ground-truth invert(x).

Writes <workdir>/cyclegan_metrics.pickle, docs/cyclegan_scale_results
table rows on stdout, and a final qualitative sheet
docs/cyclegan_epoch{last}_sheet.jpg with rows [input, translation, target].

Usage: python benchmarks/cyclegan_scale_validation.py [--epochs 100]
       [--n 1000] [--workdir /tmp/cyclegan_scale] [--skip-train]
Runtime: ~30-45 min on one v5e chip (250 steps/epoch at bs4, resident path)
+ the export sweep.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synth_landscapes import make_landscape  # noqa: E402  (same dir)


def ensure_domains(root: Path, n: int, size: int) -> tuple[Path, Path]:
    """Unpaired domains: A = landscapes (seed 9), B = inverted landscapes
    from DIFFERENT images (seed 10)."""
    data = root / "data"
    done = data / ".complete"
    da, db = data / "domainA", data / "domainB"
    if done.exists():
        return da, db
    from PIL import Image

    da.mkdir(parents=True, exist_ok=True)
    db.mkdir(parents=True, exist_ok=True)
    rng_a = np.random.default_rng(9)
    rng_b = np.random.default_rng(10)
    for i in range(n):
        Image.fromarray(make_landscape(rng_a, size, size)).save(
            da / f"img_{i:05d}.png"
        )
        Image.fromarray(255 - make_landscape(rng_b, size, size)).save(
            db / f"img_{i:05d}.png"
        )
    done.write_text("ok")
    return da, db


def heldout_batch(seed: int, n: int, size: int, invert: bool) -> np.ndarray:
    """Fresh images never seen in training, normalized to [-1, 1]."""
    rng = np.random.default_rng(seed)
    imgs = np.stack([make_landscape(rng, size, size) for _ in range(n)])
    if invert:
        imgs = 255 - imgs
    return imgs.astype(np.float32) / 127.5 - 1.0


def train_run(workdir: Path, da: Path, db: Path, epochs: int, size: int,
              seed: int | None = None, suffix: str = "") -> Path:
    from imagegeneration_tpu.core import rng as rnglib
    from imagegeneration_tpu.train.cyclegan_engine import CycleGANEngine

    run_dir = workdir / f"cyclegan_run{suffix}"
    eng = CycleGANEngine(
        dataset1_path=str(da),
        dataset2_path=str(db),
        path_like=str(run_dir),
        batch_size=4,
        image_size=(size, size),
        seed=seed if seed is not None else rnglib.DEFAULT_MODEL_SEED,
    )
    eng.train(epochs, checkpoint_frequency=5)
    return run_dir


def sweep(run_dir: Path, size: int, sheet_out: Path | None) -> dict[int, dict]:
    import jax
    import jax.numpy as jnp

    from imagegeneration_tpu.core.checkpoint import (
        find_epoch_files,
        load_params,
    )
    from imagegeneration_tpu.evalx.pd import load_vgg16_params, make_pd_fn
    from imagegeneration_tpu.models.cyclegan import CycleGANConfig, Generator

    cfg = CycleGANConfig(image_size=(size, size, 3))
    gen = Generator(cfg)

    @jax.jit
    def translate(params, x):
        return gen.apply(params, x, train=False)

    pd_fn = make_pd_fn(load_vgg16_params())

    xa = jnp.asarray(heldout_batch(7777, 32, size, invert=False))
    xb = jnp.asarray(heldout_batch(8888, 32, size, invert=True))
    target_a2b = -xa  # ground-truth mapping: inversion in [-1,1]
    target_b2a = -xb

    gg = find_epoch_files(
        str(run_dir / "models" / "generator_g"), "gen_weights_g-{epoch}.msgpack"
    )
    gf = dict(
        find_epoch_files(
            str(run_dir / "models" / "generator_f"),
            "gen_weights_f-{epoch}.msgpack",
        )
    )
    results: dict[int, dict] = {}
    last = None
    for e, p_g in gg:
        if e not in gf:
            continue
        pg = jax.device_put(load_params(p_g))
        pf = jax.device_put(load_params(gf[e]))
        fake_b = translate(pg, xa)
        fake_a = translate(pf, xb)
        cycled_a = translate(pf, fake_b)
        cycled_b = translate(pg, fake_a)
        m = {
            "oracle_mae_a2b": float(jnp.mean(jnp.abs(fake_b - target_a2b))),
            "oracle_mae_b2a": float(jnp.mean(jnp.abs(fake_a - target_b2a))),
            "cycle_mae_a": float(jnp.mean(jnp.abs(cycled_a - xa))),
            "cycle_mae_b": float(jnp.mean(jnp.abs(cycled_b - xb))),
            "pd_to_target_a2b": float(jnp.mean(pd_fn(fake_b, target_a2b))),
        }
        results[e] = m
        last = (e, np.asarray(xa), np.asarray(fake_b), np.asarray(target_a2b))
        print(
            f"epoch {e}: oracle MAE a2b {m['oracle_mae_a2b']:.4f} / "
            f"b2a {m['oracle_mae_b2a']:.4f}, cycle {m['cycle_mae_a']:.4f}/"
            f"{m['cycle_mae_b']:.4f}, PD-to-target {m['pd_to_target_a2b']:.3e}",
            flush=True,
        )

    if sheet_out is not None and last is not None:
        e, xin, xtr, xtg = last
        from PIL import Image

        k = 6
        rows = []
        for imgs in (xin[:k], xtr[:k], xtg[:k]):
            row = np.concatenate(list(imgs), axis=1)
            rows.append(row)
        sheet = np.concatenate(rows, axis=0)
        sheet = ((np.clip(sheet, -1, 1) + 1) * 127.5).astype(np.uint8)
        Image.fromarray(sheet).save(sheet_out, quality=92)
        print(f"sheet (rows: input / G_g / ground truth) -> {sheet_out}")
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--workdir", default="/tmp/cyclegan_scale")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--sheet-out", default=None)
    ap.add_argument("--seed", type=int, default=None,
                    help="model/training seed (VERDICT r4 #7: second-seed "
                    "replication of the scale validation). Dataset seeds stay "
                    "fixed (9/10) so both seeds train on identical domains. "
                    "When set, the run dir and metrics pickle get a _s<seed> "
                    "suffix.")
    args = ap.parse_args()

    import jax

    from imagegeneration_tpu.core.platform import (
        honor_env_platform,
        setup_compile_cache,
    )

    honor_env_platform()
    setup_compile_cache(jax)

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    da, db = ensure_domains(workdir, args.n, args.size)
    suffix = f"_s{args.seed}" if args.seed is not None else ""
    run_dir = workdir / f"cyclegan_run{suffix}"
    if not args.skip_train:
        run_dir = train_run(workdir, da, db, args.epochs, args.size,
                            seed=args.seed, suffix=suffix)

    sheet = Path(args.sheet_out) if args.sheet_out else None
    results = sweep(run_dir, args.size, sheet)
    with open(workdir / f"cyclegan_metrics{suffix}.pickle", "wb") as f:
        pickle.dump(results, f)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
