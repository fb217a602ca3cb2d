"""Import trained reference Keras .h5 weights into this framework.

A user of the reference has trained artifacts saved as Keras .h5 models
(sndcgan/SNDCGAN.py:327-331, wasserstein_gan/WGAN.py:263-266) or weight files
(cyclegan/CycleGAN.py:414-420). This module converts them into this
framework's parameter trees so sampling/evaluation continue seamlessly —
"samples from imported reference weights can be compared image-wise"
(SURVEY.md §7 hard parts).

Verified numerical correspondences (tests/test_keras_import.py runs the real
TF layers side by side):
- Dense / Conv2D kernels carry over unchanged (Keras and lax both use
  (in, out) / (kh, kw, in, out) with identical TF-SAME padding; conv maxdiff
  0.0);
- Conv2DTranspose: Keras stores (kh, kw, out, in) and computes the
  gradient-of-conv; `lax.conv_transpose(..., transpose_kernel=False)` with
  kernel = rot180(k_keras) transposed to (kh, kw, in, out) reproduces it to
  float32 rounding (maxdiff ~1e-7);
- BatchNorm gamma/beta/moving_mean/moving_variance map 1:1 (eps 1e-3 matched).

Reads .h5 via h5py directly (no TF dependency at import time); handles both
the Keras 2 ("<layer>/<layer>/kernel:0") and Keras 3
("<layer>/<model>/<layer>/kernel") layouts.

Known limitation (round 1): the CycleGAN generators were exported with
`save_weights` on a nested-Sequential + tensorflow_addons model
(cyclegan/CycleGAN.py:414-420); that file layout differs per Keras major
version and tfa is unavailable here to validate a mapping, so CycleGAN
weight import is not yet provided — CycleGAN training resumes from its own
checkpoints instead (the reference's primary mechanism too, :250-269).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def convt_kernel_to_flax(k_keras: np.ndarray) -> np.ndarray:
    """(kh, kw, out, in) gradient-of-conv kernel -> (kh, kw, in, out)
    fractionally-strided-conv kernel: rotate 180 degrees spatially and swap
    the channel axes (verified exact vs tf.keras.layers.Conv2DTranspose)."""
    return np.ascontiguousarray(
        np.transpose(k_keras[::-1, ::-1], (0, 1, 3, 2))
    )


def read_h5_layers(path: str | Path) -> list[tuple[str, dict[str, np.ndarray]]]:
    """[(layer_name, {tensor_basename: array})] in model layer order."""
    import h5py

    out: list[tuple[str, dict[str, np.ndarray]]] = []
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        layer_names = [
            n.decode() if isinstance(n, bytes) else str(n)
            for n in root.attrs.get("layer_names", list(root.keys()))
        ]
        for name in layer_names:
            if name not in root:
                continue
            tensors: dict[str, np.ndarray] = {}

            def _walk(g):
                import h5py as _h5

                for key in g:
                    item = g[key]
                    if isinstance(item, _h5.Dataset):
                        base = key.split(":")[0]  # strip Keras-2 ':0'
                        tensors[base] = np.asarray(item)
                    else:
                        _walk(item)

            _walk(root[name])
            out.append((name, tensors))
    return out


def _layers_with_weights(layers):
    return [(n, t) for n, t in layers if t]


def import_sndcgan_generator(h5_path: str | Path) -> dict:
    """Reference make_dcgan_generator .h5 -> {"params", "batch_stats"} for
    models/sndcgan.Generator. Weighted-layer order (SNDCGAN.py:25-66):
    dense, bn, (convT, bn) x3, convT."""
    weighted = _layers_with_weights(read_h5_layers(h5_path))
    expect = 1 + 1 + 3 * 2 + 1
    if len(weighted) != expect:
        raise ValueError(
            f"expected {expect} weighted layers for the SNDCGAN generator, "
            f"got {len(weighted)}: {[n for n, _ in weighted]}"
        )
    it = iter(weighted)

    def nxt():
        return next(it)[1]

    params: dict = {}
    stats: dict = {}

    dense = nxt()
    params["stem"] = {"Dense_0": {"kernel": dense["kernel"]}}

    def take_bn(name):
        bn = nxt()
        params[name] = {
            "BatchNorm_0": {"scale": bn["gamma"], "bias": bn["beta"]}
        }
        stats[name] = {
            "BatchNorm_0": {
                "mean": bn["moving_mean"], "var": bn["moving_variance"]
            }
        }

    take_bn("stem_bn")
    for i in range(3):
        conv = nxt()
        params[f"up{i}"] = {
            "ConvTranspose_0": {"kernel": convt_kernel_to_flax(conv["kernel"])}
        }
        take_bn(f"up{i}_bn")
    conv = nxt()
    params["to_rgb"] = {
        "ConvTranspose_0": {"kernel": convt_kernel_to_flax(conv["kernel"])}
    }
    return {"params": params, "batch_stats": stats}


def import_sndcgan_discriminator(h5_path: str | Path) -> dict:
    """Reference make_dcgan_discriminator .h5 -> {"params", "spectral"} for
    models/sndcgan.Discriminator (7 convs + dense head, SNDCGAN.py:69-128).
    The reference has no spectral norm, so `spectral` is empty (load into a
    spectral_norm=False config)."""
    weighted = _layers_with_weights(read_h5_layers(h5_path))
    if len(weighted) != 8:
        raise ValueError(
            f"expected 8 weighted layers for the SNDCGAN discriminator, got "
            f"{len(weighted)}: {[n for n, _ in weighted]}"
        )
    params: dict = {}
    for i in range(7):
        t = weighted[i][1]
        params[f"conv{i}"] = {
            "Conv_0": {"kernel": t["kernel"], "bias": t["bias"]}
        }
    head = weighted[7][1]
    params["head"] = {
        "Dense_0": {"kernel": head["kernel"], "bias": head["bias"]}
    }
    return {"params": params, "spectral": {}}


def import_wgan_generator(h5_path: str | Path) -> dict:
    """Reference WGAN define_generator .h5 (WGAN.py:105-134): dense,
    (convT, bn) x3, conv head."""
    weighted = _layers_with_weights(read_h5_layers(h5_path))
    expect = 1 + 3 * 2 + 1
    if len(weighted) != expect:
        raise ValueError(
            f"expected {expect} weighted layers for the WGAN generator, got "
            f"{len(weighted)}: {[n for n, _ in weighted]}"
        )
    it = iter(weighted)
    params: dict = {}
    stats: dict = {}
    params["stem"] = {"Dense_0": {"kernel": next(it)[1]["kernel"]}}
    for i in range(3):
        conv = next(it)[1]
        params[f"up{i}"] = {
            "ConvTranspose_0": {"kernel": convt_kernel_to_flax(conv["kernel"])}
        }
        bn = next(it)[1]
        params[f"up{i}_bn"] = {
            "BatchNorm_0": {"scale": bn["gamma"], "bias": bn["beta"]}
        }
        stats[f"up{i}_bn"] = {
            "BatchNorm_0": {
                "mean": bn["moving_mean"], "var": bn["moving_variance"]
            }
        }
    params["to_rgb"] = {"Conv_0": {"kernel": next(it)[1]["kernel"]}}
    return {"params": params, "batch_stats": stats}


def import_wgan_critic(h5_path: str | Path) -> dict:
    """Reference WGAN define_critic .h5 (WGAN.py:53-101): (conv, bn) x7 +
    dense head."""
    weighted = _layers_with_weights(read_h5_layers(h5_path))
    expect = 7 * 2 + 1
    if len(weighted) != expect:
        raise ValueError(
            f"expected {expect} weighted layers for the WGAN critic, got "
            f"{len(weighted)}: {[n for n, _ in weighted]}"
        )
    it = iter(weighted)
    params: dict = {}
    stats: dict = {}
    for i in range(7):
        conv = next(it)[1]
        params[f"conv{i}"] = {
            "Conv_0": {"kernel": conv["kernel"], "bias": conv["bias"]}
        }
        bn = next(it)[1]
        params[f"conv{i}_bn"] = {
            "BatchNorm_0": {"scale": bn["gamma"], "bias": bn["beta"]}
        }
        stats[f"conv{i}_bn"] = {
            "BatchNorm_0": {
                "mean": bn["moving_mean"], "var": bn["moving_variance"]
            }
        }
    head = next(it)[1]
    params["head"] = {
        "Dense_0": {"kernel": head["kernel"], "bias": head["bias"]}
    }
    return {"params": params, "batch_stats": stats}


IMPORTERS = {
    "sndcgan-gen": import_sndcgan_generator,
    "sndcgan-disc": import_sndcgan_discriminator,
    "wgan-gen": import_wgan_generator,
    "wgan-critic": import_wgan_critic,
}


def main(argv=None) -> None:
    import argparse

    from imagegeneration_tpu.core.checkpoint import export_params

    parser = argparse.ArgumentParser(
        description="Convert reference Keras .h5 weights to msgpack exports."
    )
    parser.add_argument("h5_path")
    parser.add_argument("out_path", help="destination .msgpack")
    parser.add_argument("--kind", choices=sorted(IMPORTERS), required=True)
    args = parser.parse_args(argv)
    tree = IMPORTERS[args.kind](args.h5_path)
    export_params(args.out_path, tree)
    print(f"imported {args.kind} weights -> {args.out_path}")


if __name__ == "__main__":
    main()
