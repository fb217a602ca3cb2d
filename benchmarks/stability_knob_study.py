"""Recorded validation of the --d-updates stability knob (VERDICT r2 #6).

Round-1 real-scale validation (docs/STATUS.md) observed mode collapse under
the reference's double-D-update cadence (G update, then TWO Adam applies on
the discriminator per batch — sndcgan/SNDCGAN.py:241-269) and proposed
`--d-updates 1` (one combined real+fake D loss/apply, standard DCGAN) as the
stability knob. Round 2 shipped the knob + a unit test but no training
evidence. This study produces the evidence:

Two identical ~N-epoch runs on the 2000-image structured synthetic landscape
set at the reference's 144x256, batch 32, faithful BCE f32 config, differing
ONLY in d_updates (2 = faithful vs 1 = knob). Per-checkpoint FID is then
computed two ways:
  - "own" extractor: each run's final discriminator (the reference's own
    FID methodology, generator_evaluation.py:134-138);
  - "shared" extractor: run A's final discriminator for BOTH runs, so the
    two configs are comparable on one fixed feature space.

Writes docs/stability_knob_results.md (table) and per-run fids_line.png /
fids_boxplot.png via the standard FIDEvaluator plots.

Usage: python benchmarks/stability_knob_study.py [--epochs 100] [--n 2000]
       [--workdir /tmp/stability_study]
Runtime: ~30-45 min on one v5e chip + this 1-core host.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_dataset(root: Path, n: int, h: int, w: int) -> Path:
    out = root / "data" / "landscape"
    done = root / "data" / ".complete"
    if done.exists():
        return root / "data"
    from PIL import Image

    from synth_landscapes import make_landscape  # same dir

    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(9)
    for i in range(n):
        Image.fromarray(make_landscape(rng, h, w)).save(out / f"img_{i:05d}.png")
    done.write_text("ok")
    return root / "data"


def train_run(workdir: Path, data_dir: Path, name: str, d_updates: int,
              epochs: int, seed: int | None = None) -> Path:
    from imagegeneration_tpu.core import rng as rnglib
    from imagegeneration_tpu.train.sndcgan_engine import SNDCGANEngine

    run_dir = workdir / f"run_{name}"
    eng = SNDCGANEngine(
        dir_path=str(run_dir),
        dataset=str(data_dir),
        batch_size=32,
        dropout=0.5,
        live_output=str(workdir / f"live_{name}"),
        image_size=(144, 256, 3),
        d_updates=d_updates,
        preview_frequency=25,
        seed=seed if seed is not None else rnglib.DEFAULT_MODEL_SEED,
    )
    eng.train(epochs, checkpoint_frequency=5)
    return run_dir


def fid_sweep(run_dir: Path, data_dir: Path, label: str,
              extractor_dir: Path | None = None,
              step_size: int = 1) -> dict[int, float]:
    """Per-epoch mean FID for one run. extractor_dir overrides where the
    discriminator features come from (shared-extractor comparison)."""
    from imagegeneration_tpu.core.data import ImageFolderDataset
    from imagegeneration_tpu.evalx.fid import FIDEvaluator

    eval_dir = run_dir / f"evaluation_{label}"
    if eval_dir.exists():
        shutil.rmtree(eval_dir)
    src = extractor_dir or run_dir
    ev = FIDEvaluator(
        dir_path=str(src),
        output_dir=str(eval_dir),
        image_size=(144, 256, 3),
        dropout=0.5,
    )
    # Generators always come from run_dir; the evaluator reads them from
    # dir_path, so for the shared-extractor sweep point dir_path at the
    # extractor run and copy nothing — instead evaluate with dir_path=run_dir
    # but a pre-resolved disc_epoch from extractor_dir when shared.
    if extractor_dir is not None:
        # copy the extractor's final disc export next to this run's models
        from imagegeneration_tpu.core.checkpoint import find_epoch_files

        found = find_epoch_files(
            str(extractor_dir / "models" / "discriminator"),
            "disc_model-{epoch}.msgpack",
        )
        e, p = found[-1]
        dst = run_dir / "models" / "discriminator" / f"disc_model-9999.msgpack"
        shutil.copyfile(p, dst)
        ev = FIDEvaluator(
            dir_path=str(run_dir),
            output_dir=str(eval_dir),
            image_size=(144, 256, 3),
            dropout=0.5,
        )
        results = ev.evaluate(
            dataset=ImageFolderDataset(str(data_dir), (144, 256), labeled=True),
            batch_size=32, disc_epoch=9999, step_size=step_size,
        )
    else:
        results = ev.evaluate(
            dataset=ImageFolderDataset(str(data_dir), (144, 256), labeled=True),
            batch_size=32, step_size=step_size,
        )
    ev.plot(results)
    return {e: float(np.mean(v)) for e, v in sorted(results.items())}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--workdir", default="/tmp/stability_study")
    ap.add_argument("--fid-step", type=int, default=1,
                    help="stride over exported epochs for the FID sweeps "
                    "(CPU fallback: every Nth export)")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse existing runs, redo only the FID sweeps")
    ap.add_argument("--seed", type=int, default=None,
                    help="model/training seed (VERDICT r3 #7: second-seed "
                    "replication). Default: the repo's DEFAULT_MODEL_SEED. "
                    "When set, run dirs and the results file get a _s<seed> "
                    "suffix so seeds can be compared side by side.")
    args = ap.parse_args()

    import jax

    from imagegeneration_tpu.core.platform import (
        honor_env_platform,
        setup_compile_cache,
    )

    honor_env_platform()  # JAX_PLATFORMS=cpu fallback works despite sitecustomize
    setup_compile_cache(jax)

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    data_dir = ensure_dataset(workdir, args.n, 144, 256)

    suffix = f"_s{args.seed}" if args.seed is not None else ""
    runs = {}
    for base, d_updates in (("faithful_d2", 2), ("knob_d1", 1)):
        name = base + suffix
        run_dir = workdir / f"run_{name}"
        if not args.skip_train or not run_dir.exists():
            run_dir = train_run(
                workdir, data_dir, name, d_updates, args.epochs,
                seed=args.seed,
            )
        runs[base] = run_dir

    own = {n: fid_sweep(runs[n], data_dir, "own", step_size=args.fid_step)
           for n in runs}
    shared = {
        n: fid_sweep(runs[n], data_dir, "shared",
                     extractor_dir=runs["faithful_d2"],
                     step_size=args.fid_step)
        for n in runs
    }

    lines = [
        "# --d-updates stability study (synthetic landscapes, 144x256 bs32)",
        "",
        f"Two {args.epochs}-epoch runs on {args.n} synthetic landscape images",
        "(benchmarks/synth_landscapes.py), faithful BCE f32 config, identical",
        "seeds/data — differing only in `--d-updates` (2 = the reference's",
        "double D apply, sndcgan/SNDCGAN.py:251-267; 1 = combined-loss knob).",
        "",
        "FID per exported epoch; 'own' = each run's final discriminator as",
        "the feature extractor (reference methodology), 'shared' = the",
        "faithful run's final discriminator for both (comparable axis).",
        "",
        "| epoch | d2 own | d1 own | d2 shared | d1 shared |",
        "|---|---|---|---|---|",
    ]
    epochs = sorted(own["faithful_d2"])
    for e in epochs:
        row = [str(e)]
        for table in (own, shared):
            for n in ("faithful_d2", "knob_d1"):
                v = table[n].get(e)
                row.append(f"{v:.1f}" if v is not None else "—")
        lines.append("| " + " | ".join(row) + " |")
    out_name = f"stability_knob_results{suffix}.md" if suffix else "stability_knob_results.md"
    out_md = Path(__file__).resolve().parent.parent / "docs" / out_name
    out_md.write_text("\n".join(lines) + "\n")
    print(json.dumps({"own": own, "shared": shared}, indent=2))
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
