"""CycleGAN perception-distance CLI — signature-compatible with
cyclegan/generator_evaluation.py:143-154.

  python -m imagegeneration_tpu.cli.cyclegan_evaluation <generators> <samples>
      [-s SAMPLESIZE] [-o OUTPUT]

Behavior (reference main(), :123-140): one batch of domain images; for every
epoch-stamped generator weights file in <generators>, translate the batch,
nearest-resize input/output pairs to 224x224, compute VGG16-feature MSE per
pair, then render the log-scale boxplot + median/mean line plots
(:77-120 — whose filenames say "fids" while the y-label says perception
distance; both quirks kept).
"""

from __future__ import annotations

import argparse
from os import path

import numpy as np


def plot_pd(epochs, pds, output_dir: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    order = np.argsort(epochs)
    epochs = [epochs[i] for i in order]
    pds = [pds[i] for i in order]

    plt.clf()
    _, ax = plt.subplots(nrows=1, ncols=1, figsize=(max(3 * len(epochs), 6), 12))
    ax.boxplot(pds, vert=True, showmeans=True, meanline=True,
               tick_labels=[str(e) for e in epochs])
    ax.yaxis.grid(True)
    ax.set_yscale("log")
    ax.set_xlabel("Epoch", fontsize=14)
    ax.set_ylabel("Perception Distance", fontsize=14)
    plt.tight_layout()
    plt.savefig(path.join(output_dir, "plot_boxplot_fids.pdf"), dpi=300)
    plt.close()

    plt.clf()
    plt.plot(epochs, [float(np.median(p)) for p in pds], label="median")
    plt.plot(epochs, [float(np.mean(p)) for p in pds], label="mean")
    plt.xlabel("Epoch", fontsize=12)
    plt.ylabel("Perception Distance", fontsize=12)
    plt.legend()
    plt.yscale("log")
    plt.xticks(epochs)
    plt.tight_layout()
    plt.savefig(path.join(output_dir, "plot_line_plot_fids.pdf"), dpi=300)
    plt.close()


def main_eval(
    samples_path: str,
    generators_path: str,
    sample_size: int,
    output: str,
    generator_image_dim=(128, 128, 3),
    weights_path: str | None = None,
    quirk_axis1: bool = False,
):
    import jax
    import jax.numpy as jnp

    from imagegeneration_tpu.core.checkpoint import find_epoch_files, load_params
    from imagegeneration_tpu.core.data import ImageFolderDataset
    from imagegeneration_tpu.evalx.pd import load_vgg16_params, make_pd_fn
    from imagegeneration_tpu.models.cyclegan import CycleGANConfig, Generator

    h, w, _ = generator_image_dim
    ds = ImageFolderDataset(samples_path, (h, w), labeled=False)
    batch_u8 = next(ds.epoch_batches(min(sample_size, len(ds)), epoch=0))
    data = jnp.asarray(batch_u8.astype(np.float32) / 127.5 - 1.0)

    gen = Generator(
        CycleGANConfig(image_size=generator_image_dim, quirk_axis1=quirk_axis1)
    )
    translate = jax.jit(lambda v, x: gen.apply(v, x))
    pd_fn = make_pd_fn(load_vgg16_params(weights_path))

    found = find_epoch_files(generators_path, "gen_weights_f-{epoch}.msgpack")
    found += find_epoch_files(generators_path, "gen_weights_g-{epoch}.msgpack")
    if not found:
        raise FileNotFoundError(f"no generator weight exports in {generators_path}")

    epochs, pds = [], []
    for epoch, file in found:
        g_vars = load_params(file)
        out = translate(g_vars, data)
        per_pair = np.asarray(pd_fn(data, out))
        epochs.append(epoch)
        pds.append(list(map(float, per_pair)))
        print(f"epoch {epoch}: PD mean {np.mean(per_pair):.6f}")
    plot_pd(epochs, pds, output)
    return epochs, pds


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Evaluate CycleGAN")
    parser.add_argument(
        "generators", type=str, help="Path where the gen models lie"
    )
    parser.add_argument("samples", type=str, help="Path where the samples lie")
    parser.add_argument(
        "-s", "--sampleSize", type=int, dest="sampleSize", default=128,
        help="Sample Size of images that are used to calculate the PD.",
    )
    parser.add_argument(
        "-o", "--output", type=str, dest="output", default="training",
        help="The name of the image to (over-)write",
    )
    parser.add_argument("--height", type=int, default=128)
    parser.add_argument("--width", type=int, default=128)
    parser.add_argument("--vgg-weights", type=str, default=None,
                        help="Keras-format VGG16 .h5 (else fixed random init)")
    parser.add_argument("--quirk-axis1", action="store_true", default=False)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from imagegeneration_tpu.core.platform import honor_env_platform
    honor_env_platform()
    main_eval(
        args.samples,
        args.generators,
        args.sampleSize,
        args.output,
        (args.height, args.width, 3),
        args.vgg_weights,
        args.quirk_axis1,
    )


if __name__ == "__main__":
    main()
