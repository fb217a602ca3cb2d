"""CycleGAN training CLI — signature-compatible with cyclegan/Trainer.py:7-27.

  python -m imagegeneration_tpu.cli.cyclegan_trainer <bSize> <epochs>
      [-x DATA1] [-y DATA2] [-d DIR] [-c FREQ] [-ct]

Reference quirks preserved: image size 128x128 (Trainer.py:5), -ct is
accepted but training auto-resumes from the latest checkpoint regardless
(the reference parses the flag and never uses it; CycleGAN.py:263-269
restores unconditionally). The -c checkpoint frequency is likewise parsed
but not forwarded by the reference Trainer (CycleGAN.py:384 default 5 is
used) — here it IS forwarded, as the flag documents.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Train CycleGAN to translate between image domains"
    )
    parser.add_argument("bSize", type=int, help="Batch Size to use")
    parser.add_argument("epochs", type=int, help="Number of epochs to train")
    parser.add_argument(
        "-x", "--data1", type=str, dest="dataset1", default="x_data",
        help="The directory where the images from domain one can be found.",
    )
    parser.add_argument(
        "-y", "--data2", type=str, dest="dataset2", default="y_data",
        help="The directory where the images from domain two can be found.",
    )
    parser.add_argument(
        "-d", "--directory", type=str, dest="path", default="training",
        help="The output directory where the checkpoints are saved.",
    )
    parser.add_argument(
        "-c", "--checkpoints", type=int, dest="chps", default=5,
        help="Take checkpoint every x epochs. Default = 5",
    )
    parser.add_argument(
        "-ct", "--continue", dest="continue_", action="store_true", default=False,
        help="Continue training (default: Start from the beginning)",
    )
    # --- extensions ---
    parser.add_argument("--bf16", action="store_true", default=False)
    parser.add_argument("--mesh-data", type=int, default=0)
    parser.add_argument("--mesh-spatial", type=int, default=1,
                        help="spatial (image-H) partition factor on top of "
                        "data parallelism")
    parser.add_argument("--height", type=int, default=128)
    parser.add_argument("--width", type=int, default=128)
    parser.add_argument("--quirk-axis1", action="store_true", default=False,
                        help="bug-compatible tfa InstanceNormalization(axis=1)")
    parser.add_argument("--seed", type=int, default=62)
    parser.add_argument("--profile", action="store_true", default=False)
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
    from imagegeneration_tpu.train.cyclegan_engine import CycleGANEngine

    mesh = None
    if args.mesh_data:
        maybe_init_distributed()
        mesh = make_mesh(
            MeshConfig(data=args.mesh_data, spatial=args.mesh_spatial)
        )

    engine = CycleGANEngine(
        args.dataset1,
        args.dataset2,
        args.path,
        args.bSize,
        (args.width, args.height),
        quirk_axis1=args.quirk_axis1,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        seed=args.seed,
        mesh=mesh,
        spatial=args.mesh_spatial > 1,
        host_sharded_data=args.host_sharded_data,
        profile=args.profile,
    )
    engine.train(args.epochs, args.chps)


if __name__ == "__main__":
    main()
