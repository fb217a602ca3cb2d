"""Sample-grid preview rendering (live PDFs, WGAN 10x10 grids, epoch grids).

Reproduces the reference's visual-inspection artifacts:
- `plot_image` including its double-denormalization quirk: samples already in
  [0,1] get a second Rescaling(1/2, +0.5), landing preview pixels in
  [0.25, 0.75] (generator_output.py:31-34 — faithfully kept, it is the look
  of every reference artifact);
- SNDCGAN per-epoch 1xN live preview PDF with suptitle info text
  (sndcgan/SNDCGAN.py:228-238);
- WGAN 10x10 grid JPGs (wasserstein_gan/WGAN.py:230-249);
- multi-epoch sample grids (generator_output.py:37-48);
- CycleGAN input/output pair sheets (cyclegan/CycleGAN.py:274-313).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def plot_image(ax, image: np.ndarray) -> None:
    """Reference plot_image incl. the double-denorm quirk
    (generator_output.py:31-34)."""
    ax.imshow(np.clip(image / 2.0 + 0.5, 0.0, 1.0))


def live_preview(
    samples: np.ndarray, info_text: str, out_file: str | Path
) -> None:
    """1xN preview figure (sndcgan/SNDCGAN.py:228-238)."""
    n = samples.shape[0]
    figure = plt.figure(figsize=(20, 10))
    for j in range(n):
        ax = figure.add_subplot(1, n, j + 1)
        ax.get_xaxis().set_visible(False)
        ax.get_yaxis().set_visible(False)
        plot_image(ax, samples[j])
    figure.suptitle(info_text, size="xx-large")
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    figure.savefig(out_file)
    plt.close(figure)


def sample_grid(
    samples: np.ndarray, rows: int, cols: int, out_file: str | Path,
    figsize: tuple[int, int] = (26, 26),
) -> None:
    """rows x cols grid (wasserstein_gan/WGAN.py:236-249)."""
    figure = plt.figure(figsize=figsize)
    for i in range(rows * cols):
        ax = figure.add_subplot(rows, cols, i + 1)
        ax.get_xaxis().set_visible(False)
        ax.get_yaxis().set_visible(False)
        plot_image(ax, samples[i])
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(out_file)
    plt.close()


def epoch_grid(
    epoch_samples: Sequence[np.ndarray],
    epochs_used: Sequence[int],
    out_file: str | Path,
) -> None:
    """Rows = epochs, cols = batch, titled per row (generator_output.py:37-48)."""
    n_rows = len(epoch_samples)
    n_cols = epoch_samples[0].shape[0]
    fig, axes = plt.subplots(
        figsize=(20, 5 * n_rows), nrows=max(n_rows, 1), ncols=max(n_cols, 1),
        sharex=True, sharey=True, squeeze=False,
    )
    for i, e in enumerate(epoch_samples):
        for j in range(n_cols):
            ax = axes[i, j]
            ax.get_xaxis().set_visible(False)
            ax.get_yaxis().set_visible(False)
            ax.set_title("Epoch:" + str(epochs_used[i]))
            plot_image(ax, e[j])
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_file)
    plt.close(fig)


def translation_sheet(
    inputs_g: np.ndarray,
    inputs_f: np.ndarray,
    outputs_g: np.ndarray,
    outputs_f: np.ndarray,
    batch_label: int | str,
    out_file: str | Path,
) -> None:
    """CycleGAN preview: input/output columns for both generators
    (cyclegan/CycleGAN.py:274-313; images in [-1,1] are denormalized once)."""
    n_cases = len(inputs_g) + len(inputs_f)
    fig, axes = plt.subplots(
        figsize=(10, 5 * n_cases), nrows=n_cases, ncols=2,
        sharex=True, sharey=True, squeeze=False,
    )

    def _show(ax, img):
        ax.get_xaxis().set_visible(False)
        ax.get_yaxis().set_visible(False)
        ax.imshow(np.clip(img / 2.0 + 0.5, 0.0, 1.0))

    row = 0
    axes[0, 0].set_title("Images for G-GAN")
    for i in range(len(inputs_g)):
        _show(axes[row, 0], inputs_g[i])
        _show(axes[row, 1], outputs_g[i])
        row += 1
    for i in range(len(inputs_f)):
        _show(axes[row, 0], inputs_f[i])
        _show(axes[row, 1], outputs_f[i])
        row += 1
    fig.suptitle(f"Batch: {batch_label}", size="xx-large")
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_file)
    plt.close(fig)
