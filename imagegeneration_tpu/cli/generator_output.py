"""Offline sampling CLI — the generator_output.py equivalent.

Signature-compatible with sndcgan/generator_output.py:103-115:
  python -m imagegeneration_tpu.cli.generator_output <every>
      [-b BSIZE] [-d DIR] [-o OUTPUT] [-s START]

Behavior parity:
- enumerates epoch-stamped generator exports under <dir>/models/generator/
  (the reference globs gen_model-<epoch>.h5; here gen_model-<epoch>.msgpack),
  filters epochs >= start, strides by `every` (generator_output.py:51-63);
- ONE fixed z ~ U[-1,1) shared across all epochs (drawn from the 'preview'
  PRNG stream for bitwise-stable output given --seed);
- renders the multi-epoch sample grid PDF via create_samples semantics
  (G(z, train=False) -> [0,1]) and the quirky plot_image double-denorm
  (generator_output.py:25-48).

`create_samples` / `output_results_models` are importable, mirroring the
reference's reuse of these functions from other scripts.
"""

from __future__ import annotations

import argparse
from os import path

import numpy as np


def create_samples(gen, g_variables, input_z, batch_size, image_size):
    """G(z, training=False) denormalized to [0,1] (generator_output.py:25-28).

    Jitted per generator module (cached across epochs — same shapes, one
    compile): eager apply on a tunneled TPU would remote-compile every op.
    """
    import jax
    import jax.numpy as jnp

    # Keyed on the module object itself (a dict keyed by id() could collide
    # with a recycled address after GC); holding the key keeps gen alive.
    # Bounded LRU: distinct generator configs would otherwise pin every
    # module + jitted sampler for the process lifetime (ADVICE r2).
    fn = _sampler_cache.pop(gen, None)
    if fn is None:
        fn = jax.jit(lambda v, z: (gen.apply(v, z, train=False) + 1.0) / 2.0)
    _sampler_cache[gen] = fn  # re-insert = most recently used
    while len(_sampler_cache) > _SAMPLER_CACHE_MAX:
        _sampler_cache.pop(next(iter(_sampler_cache)))
    imgs = fn(g_variables, input_z)
    return np.asarray(jnp.reshape(imgs, (batch_size, *image_size)))


_sampler_cache: dict = {}
_SAMPLER_CACHE_MAX = 4


def output_results_models(
    batch_size: int,
    dir_path: str,
    every: int,
    output_image: str,
    start_epoch: int,
    image_size=(144, 256, 3),
    z_size: int = 128,
    seed: int = 62,
) -> list[int]:
    import jax

    from imagegeneration_tpu.core import preview as previewlib
    from imagegeneration_tpu.core import rng as rnglib
    from imagegeneration_tpu.core.checkpoint import find_epoch_files, load_params
    from imagegeneration_tpu.models.sndcgan import Generator, SNDCGANConfig

    model_path = path.join(dir_path, "models", "generator")
    found = find_epoch_files(model_path, "gen_model-{epoch}.msgpack")
    epochs_used = [e for e, _ in found if e >= start_epoch][::every]
    files = {e: p for e, p in found}
    if not epochs_used:
        raise FileNotFoundError(f"no generator exports under {model_path}")

    gen = Generator(SNDCGANConfig(image_size=image_size, z_size=z_size))
    chain = rnglib.KeyChain(seed)
    fixed_z = rnglib.uniform_z(chain.stream("preview"), batch_size, z_size)

    epoch_samples = []
    for i, epoch in enumerate(epochs_used):
        print(f"\r Load Model {i}", end="", flush=True)
        g_vars = load_params(files[epoch])  # raw restore, no eager init
        epoch_samples.append(
            create_samples(gen, g_vars, fixed_z, batch_size, image_size)
        )
    print()
    previewlib.epoch_grid(
        epoch_samples, epochs_used, path.join(dir_path, output_image + ".pdf")
    )
    return epochs_used


def output_results_ckpts(
    batch_size: int,
    dir_path: str,
    every: int,
    output_image: str,
    start_epoch: int,
    image_size=(144, 256, 3),
    z_size: int = 128,
    seed: int = 62,
) -> list[int]:
    """Restore full training checkpoints instead of exports
    (generator_output.py:73-100)."""
    import jax

    from imagegeneration_tpu.core import preview as previewlib
    from imagegeneration_tpu.core import rng as rnglib
    from imagegeneration_tpu.core.checkpoint import CheckpointManager
    from imagegeneration_tpu.models.sndcgan import Generator, SNDCGANConfig
    from imagegeneration_tpu.train.sndcgan_step import (
        SNDCGANTrainConfig,
        init_state,
    )

    cfg = SNDCGANTrainConfig(
        model=SNDCGANConfig(image_size=image_size, z_size=z_size)
    )
    mgr = CheckpointManager(path.join(dir_path, "checkpoints"))
    template = init_state(cfg)
    gen = Generator(cfg.model)
    chain = rnglib.KeyChain(seed)
    fixed_z = rnglib.uniform_z(chain.stream("preview"), batch_size, z_size)

    epochs_used = [e for e in mgr.all_epochs() if e >= start_epoch][::every]
    epoch_samples = []
    for i, epoch in enumerate(epochs_used):
        print(f"\r Load Checkpoint {i}", end="", flush=True)
        state = mgr.restore(template, epoch)
        g_vars = {
            "params": state.g_params,
            "batch_stats": state.g_batch_stats,
        }
        epoch_samples.append(
            create_samples(gen, g_vars, fixed_z, batch_size, image_size)
        )
    print()
    previewlib.epoch_grid(
        epoch_samples, epochs_used, path.join(dir_path, output_image + ".pdf")
    )
    return epochs_used


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Train GAN to generate landscapes"
    )
    parser.add_argument(
        "every", type=int, help="Produce example for every xth checkpoint"
    )
    parser.add_argument("-b", "--bSize", type=int, dest="bSize", default=3)
    parser.add_argument(
        "-d", "--directory", type=str, dest="dirPath", default="training"
    )
    parser.add_argument(
        "-o", "--output", type=str, dest="output", default="training"
    )
    parser.add_argument("-s", "--start", type=int, dest="start", default=0)
    parser.add_argument("--height", type=int, default=144)
    parser.add_argument("--width", type=int, default=256)
    parser.add_argument("--z", type=int, dest="z_size", default=128)
    parser.add_argument("--seed", type=int, default=62)
    parser.add_argument(
        "--from-checkpoints", action="store_true",
        help="restore training checkpoints instead of exports",
    )
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from imagegeneration_tpu.core.platform import honor_env_platform
    honor_env_platform()
    fn = output_results_ckpts if args.from_checkpoints else output_results_models
    fn(
        args.bSize,
        args.dirPath,
        args.every,
        args.output,
        args.start,
        (args.height, args.width, 3),
        args.z_size,
        args.seed,
    )


if __name__ == "__main__":
    main()
