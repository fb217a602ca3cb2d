"""WGAN real-scale training validation (VERDICT r3 #6).

Round-1/2 validated SNDCGAN (100-epoch FID trend) and CycleGAN (PD trend) at
real scale, but WGAN's quality story was only 3-step parity + throughput —
nothing showed the jitted in-graph cadence/clip implementation
(train/wgan_step.py; reference behavior wasserstein_gan/WGAN.py:279-326)
actually *trains*. This script produces that evidence:

One 100-epoch WGAN run on the 2000-image structured synthetic landscape set
(benchmarks/synth_landscapes.py) at the CLI-default 144x256, batch 32,
faithful config (f32, n_critic=5, lr 5e-5, clip 0.01). The engine already
exports 10x10 sample grids + per-interval generator/critic msgpacks.

Quantitative trend: the reference's WGAN has NO FID pipeline (only SNDCGAN
does), so the metric here is our methodology, documented as such: FID on a
FIXED feature extractor — the stability study's trained SNDCGAN
discriminator (benchmarks/stability_knob_study.py run_faithful_d2), trained
on the SAME dataset — evaluated over the WGAN generator exports. A fixed
extractor makes the per-epoch numbers comparable along the run; ranges are
kept consistent (both reals and fakes in [-1,1] — the SNDCGAN quirk-range
bug is NOT reproduced here because no reference WGAN number exists to match).

Writes docs/wgan_scale_results.md + fid trend values; sample grids live in
<workdir>/wgan_run/samples/.

Usage: python benchmarks/wgan_scale_validation.py [--epochs 100] [--n 2000]
       [--workdir /tmp/stability_study2] [--extractor-dir <sndcgan run dir>]
Runtime: ~15-25 min train on one v5e chip + the FID sweep on this host.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stability_knob_study import ensure_dataset  # noqa: E402  (same dir)


def train_run(workdir: Path, data_dir: Path, epochs: int,
              seed: int | None = None, suffix: str = "") -> Path:
    from imagegeneration_tpu.core import rng as rnglib
    from imagegeneration_tpu.train.wgan_engine import WGANEngine

    run_dir = workdir / f"wgan_run{suffix}"
    eng = WGANEngine(
        dataset=str(data_dir / "landscape"),
        image_size=(144, 256, 3),
        batch_size=32,
        critic_learn_iterations=5,
        path_like=str(run_dir),
        save_interval=5,
        seed=seed if seed is not None else rnglib.DEFAULT_MODEL_SEED,
    )
    eng.train(epochs)
    return run_dir


def fid_sweep(run_dir: Path, data_dir: Path, extractor_dir: Path,
              step_size: int = 1) -> dict[int, float]:
    """FID of each exported WGAN generator vs the real set, on the fixed
    SNDCGAN-discriminator feature space (extractor trained on this data)."""
    import jax
    import jax.numpy as jnp

    from imagegeneration_tpu.core import rng as rnglib
    from imagegeneration_tpu.core.checkpoint import (
        find_epoch_files,
        load_params,
    )
    from imagegeneration_tpu.core.data import ImageFolderDataset
    from imagegeneration_tpu.evalx.fid import calculate_fid_from_features
    from imagegeneration_tpu.models.sndcgan import (
        Discriminator,
        SNDCGANConfig,
    )
    from imagegeneration_tpu.models.wgan import Generator, WGANConfig

    found = find_epoch_files(
        str(extractor_dir / "models" / "discriminator"),
        "disc_model-{epoch}.msgpack",
    )
    d_vars = jax.device_put(load_params(found[-1][1]))
    dcfg = SNDCGANConfig(image_size=(144, 256, 3), dropout_rate=0.5)
    disc = Discriminator(dcfg)

    @jax.jit
    def features(x):
        return disc.apply(d_vars, x, train=False, update_sn=False,
                          features=True)

    wcfg = WGANConfig(image_size=(144, 256, 3))
    gen = Generator(wcfg)

    # Fused synthesis->features in ONE program: the 14 MB fake batch never
    # leaves the device. Required on the tunneled chip, whose client leaks
    # every transfer buffer (~3 GB/epoch on the unfused path — see
    # evalx/fid.py _gen_feats and docs/STATUS.md round 4).
    @jax.jit
    def gen_features(g_vars, z):
        # train=False: inference-mode BN, like the engine's sampler
        fake = gen.apply(g_vars, z, train=False)
        return features(fake)

    ds = ImageFolderDataset(
        str(data_dir / "landscape"), (144, 256), labeled=False,
        follow_links=True,
    )
    chain = rnglib.KeyChain(rnglib.DEFAULT_MODEL_SEED)
    batches = min(16, ds.num_batches(32))
    it = ds.epoch_batches(32, epoch=0)
    reals, zs = [], []
    for i in range(batches):
        b = next(it).astype(np.float32) / 127.5 - 1.0
        reals.append(b)
        zs.append(np.asarray(
            rnglib.normal_z(chain.at_step("eval", i), b.shape[0], wcfg.z_size)
        ))
    real_feats = [np.asarray(features(jnp.asarray(r))) for r in reals]

    zs_dev = [jax.device_put(z) for z in zs]
    exports = find_epoch_files(str(run_dir / "g_models"), "model_{epoch}.msgpack")
    results: dict[int, float] = {}
    for e, p in exports[::step_size]:
        g_vars = jax.device_put(load_params(p))
        fids = []
        for z, rf in zip(zs_dev, real_feats):
            ff = np.asarray(gen_features(g_vars, z))  # tanh head: [-1,1]
            fids.append(calculate_fid_from_features(ff, rf, "lowrank"))
        results[e] = float(np.mean(fids))
        print(f"wgan epoch {e}: FID {results[e]:.2f}", flush=True)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--workdir", default="/tmp/stability_study2")
    ap.add_argument("--extractor-dir", default=None,
                    help="SNDCGAN run dir with disc exports; defaults to the "
                    "stability study's run_faithful_d2 in --workdir")
    ap.add_argument("--fid-step", type=int, default=1)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--seed", type=int, default=None,
                    help="model/training seed (VERDICT r4 #7: second-seed "
                    "replication). When set, the run dir and fids pickle get "
                    "a _s<seed> suffix. Note the FID feature space is "
                    "whatever extractor run exists/is trained in this "
                    "session, so cross-session absolute FIDs are not "
                    "comparable — the trend shape is the replication target.")
    ap.add_argument("--train-extractor", action="store_true",
                    help="train the SNDCGAN feature-extractor run "
                    "(stability study's faithful_d2 config) first if the "
                    "extractor dir has no discriminator exports — needed in "
                    "fresh sessions where /tmp artifacts were reaped.")
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
    data_dir = ensure_dataset(workdir, args.n, 144, 256)
    suffix = f"_s{args.seed}" if args.seed is not None else ""
    run_dir = workdir / f"wgan_run{suffix}"
    if not args.skip_train or not run_dir.exists():
        run_dir = train_run(workdir, data_dir, args.epochs,
                            seed=args.seed, suffix=suffix)

    extractor = Path(args.extractor_dir) if args.extractor_dir else (
        workdir / "run_faithful_d2"
    )
    if args.train_extractor and not (
        extractor / "models" / "discriminator"
    ).is_dir():
        from stability_knob_study import train_run as extractor_train

        print(f"extractor missing at {extractor}; training faithful_d2 "
              f"(default seed, so the feature space does not follow --seed)",
              flush=True)
        extractor = extractor_train(
            extractor.parent, data_dir, extractor.name.removeprefix("run_"),
            d_updates=2, epochs=args.epochs,
        )
    results = fid_sweep(run_dir, data_dir, extractor, args.fid_step)
    with open(workdir / f"wgan_fids{suffix}.pickle", "wb") as f:
        pickle.dump(results, f)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
