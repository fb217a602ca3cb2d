"""WGAN training CLI — signature-compatible with wasserstein_gan/Trainer.py:34-51.

  python -m imagegeneration_tpu.cli.wgan_trainer <bSize> <epochs>
      [-d DIR] [-c INTERVAL] [-ct]

Reference quirks preserved: dataset directory defaults to the hardcoded
"bilderNeuro" (Trainer.py:49 — overridable via the new -x flag), n_critic
defaults to 5, image size 144x256, label-free dataset with follow_links.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Train Wasserstein GAN to generate landscapes"
    )
    parser.add_argument("bSize", type=int, help="Batch Size to use")
    parser.add_argument("epochs", type=int, help="Number of epochs to train")
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
    parser.add_argument(
        "-x", "--data", type=str, dest="data", default="bilderNeuro",
        help="Image directory (reference hardcodes 'bilderNeuro').",
    )
    parser.add_argument("--n-critic", type=int, default=5)
    parser.add_argument("--gp", type=float, dest="gp_lambda", default=0.0,
                        help="WGAN-GP gradient penalty weight (replaces weight clipping when > 0; reference default 0 = clipping)")
    parser.add_argument("--bf16", action="store_true", default=False)
    parser.add_argument("--mesh-data", type=int, default=0)
    parser.add_argument("--mesh-spatial", type=int, default=1,
                        help="spatial (image-H) partition factor on top of "
                        "data parallelism")
    parser.add_argument("--height", type=int, default=144)
    parser.add_argument("--width", type=int, default=256)
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
    from imagegeneration_tpu.train.wgan_engine import WGANEngine

    mesh = None
    if args.mesh_data:
        maybe_init_distributed()
        mesh = make_mesh(
            MeshConfig(data=args.mesh_data, spatial=args.mesh_spatial)
        )

    engine = WGANEngine(
        args.data,
        (args.height, args.width, 3),
        args.bSize,
        args.n_critic,
        path_like=args.path,
        load=args.continue_,
        save_interval=args.chps,
        gp_lambda=args.gp_lambda,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        seed=args.seed,
        mesh=mesh,
        spatial=args.mesh_spatial > 1,
        host_sharded_data=args.host_sharded_data,
        profile=args.profile,
    )
    engine.train(args.epochs)


if __name__ == "__main__":
    main()
