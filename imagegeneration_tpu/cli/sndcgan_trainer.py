"""SNDCGAN training CLI — signature-compatible with sndcgan/Trainer.py:10-37.

Reference usage preserved:
  python -m imagegeneration_tpu.cli.sndcgan_trainer <bSize> <epochs>
      [-cf N] [-d DIR] [-x DATA] [-r RATE] [-ld LR] [-lg LR] [-lo NAME] [-ct]

TPU extensions (new flags; defaults keep reference behavior):
  --spectral-norm        real SN-GAN discriminator (power iteration fused)
  --loss {bce,hinge}     hinge pairs with --spectral-norm (BASELINE config 2)
  --bf16                 bfloat16 compute (params stay f32)
  --mesh-data N          data-parallel mesh size (0 = single device)
  --height/--width/--z   resolution / latent overrides (ref: 144x256, z=128)
  --seed                 workload seed (default 62, the reference tf seed)
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="GAN Trainer to generate landscape images."
    )
    parser.add_argument("bSize", type=int, help="Batch Size to use.")
    parser.add_argument("epochs", type=int, help="Number of epochs to train.")
    parser.add_argument(
        "-cf", "--checkpointFrequency", type=int, dest="ckptFreq", default=5,
        help="Take checkpoint every x epochs. Default = 5",
    )
    parser.add_argument(
        "-d", "--directory", type=str, dest="dirPath", default="training",
        help="The output directory where the checkpoints and others are saved. "
        "It will be created if it dosen't exist and overritten (!) if it does.",
    )
    parser.add_argument(
        "-x", "--data", type=str, dest="data", default="dataset",
        help="The directory containing subdirectories (labels) with images to "
        "use for training.",
    )
    parser.add_argument(
        "-r", "--dropout", type=float, dest="dropout", default=0.5,
        help="The dropout rate to use for the discriminator. Default = 0.5",
    )
    parser.add_argument(
        "-ld", "--learnRateDisc", type=float, dest="learnRateDisc",
        default=0.0002, help="The learning rate for the discriminator to use.",
    )
    parser.add_argument(
        "-lg", "--learnRateGen", type=float, dest="learnRateGen",
        default=0.0002, help="The learning rate for the generator to use.",
    )
    parser.add_argument(
        "-lo", "--liveOutput", type=str, dest="liveOutput", default="live",
        help="The name of the file to use for the live-image",
    )
    parser.add_argument(
        "-ct", "--continue", dest="continue_", action="store_true",
        default=False, help="Continue training (default: Start from the beginning)",
    )
    # --- TPU-native extensions ---
    parser.add_argument("--spectral-norm", action="store_true", default=False)
    parser.add_argument("--loss", choices=["bce", "hinge"], default="bce")
    parser.add_argument("--d-updates", type=int, choices=[1, 2], default=2,
                        help="D optimizer applies per batch: 2 = faithful to "
                        "the reference's double apply (SNDCGAN.py:251-267), "
                        "1 = standard single combined update (stability "
                        "knob; pair with -ld/-lg TTUR if desired)")
    parser.add_argument("--bf16", action="store_true", default=False)
    parser.add_argument("--mesh-data", type=int, default=0,
                        help="data-parallel devices (0 = single device)")
    parser.add_argument("--mesh-spatial", type=int, default=1,
                        help="spatial (image-H) partition factor on top of "
                        "data parallelism — the config-5 scaling axis; total "
                        "devices = mesh-data x mesh-spatial")
    parser.add_argument("--height", type=int, default=144)
    parser.add_argument("--width", type=int, default=256)
    parser.add_argument("--z", type=int, dest="z_size", default=128)
    parser.add_argument("--seed", type=int, default=62)
    parser.add_argument("--preview-every", type=int, default=1,
                        help="render the live preview every N epochs")
    parser.add_argument("--profile", action="store_true", default=False,
                        help="capture a jax.profiler trace of the first "
                        "post-compile epoch into <dir>/traces")
    parser.add_argument("--host-sharded-data", action="store_true",
                        default=False,
                        help="multi-process pods: each host decodes only "
                        "its shard of the dataset folder and feeds local "
                        "samples (statistical batch composition; see "
                        "core/data.ImageFolderDataset). Default: every "
                        "host decodes the full folder and feeds its rows "
                        "of the identical global shuffle.")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from imagegeneration_tpu.core.platform import honor_env_platform
    honor_env_platform()

    from imagegeneration_tpu.core.mesh import MeshConfig, make_mesh, maybe_init_distributed
    from imagegeneration_tpu.train.sndcgan_engine import SNDCGANEngine

    mesh = None
    if args.mesh_data:
        maybe_init_distributed()
        mesh = make_mesh(
            MeshConfig(data=args.mesh_data, spatial=args.mesh_spatial)
        )

    engine = SNDCGANEngine(
        args.dirPath,
        args.data,
        args.bSize,
        args.dropout,
        args.learnRateDisc,
        args.learnRateGen,
        args.liveOutput,
        args.continue_,
        (args.height, args.width, 3),
        args.z_size,
        spectral_norm=args.spectral_norm,
        loss=args.loss,
        d_updates=args.d_updates,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        seed=args.seed,
        mesh=mesh,
        spatial=args.mesh_spatial > 1,
        host_sharded_data=args.host_sharded_data,
        profile=args.profile,
        preview_frequency=args.preview_every,
    )
    # Reference quirk preserved: Trainer.py:37 trains epochs+1.
    engine.train(args.epochs + 1, args.ckptFreq)


if __name__ == "__main__":
    main()
