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

CycleGAN generators were exported with `save_weights` (weights-only h5,
cyclegan/CycleGAN.py:414-420) on a nested-Sequential + custom-ResBlock
model; `import_cyclegan_generator` walks the Keras-2 layer_names/
weight_names ordering and maps positionally onto models/cyclegan.Generator.
Output parity is tested against a tf_keras replica of the reference
structure with GroupNormalization(groups=-1) (== per-channel InstanceNorm,
this framework's corrected default). Real tfa InstanceNormalization(axis=1)
artifacts carry per-H-position gamma/beta — detected by shape and reshaped
for `quirk_axis1=True` models (tfa itself is not installable here to test
that flavor end-to-end).
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


def _read_save_weights_h5(path: str | Path) -> list[tuple[str, np.ndarray]]:
    """Ordered (weight_path, array) stream from a Keras-2 save_weights h5:
    layer order from the root `layer_names` attr, intra-layer order from each
    layer group's `weight_names` attr."""
    import h5py

    def _s(x):
        return x.decode() if isinstance(x, bytes) else str(x)

    out: list[tuple[str, np.ndarray]] = []
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        if "layer_names" not in root.attrs:
            raise ValueError(
                f"{path} is not a Keras-2 save_weights h5 (no layer_names "
                f"attr); Keras-3 .weights.h5 files are not supported"
            )
        for lname in [_s(x) for x in root.attrs["layer_names"]]:
            g = root[lname]
            for wname in [_s(x) for x in g.attrs.get("weight_names", [])]:
                out.append((f"{lname}/{wname}", np.asarray(g[wname])))
    return out


def _in_params(gamma: np.ndarray, beta: np.ndarray, channels: int):
    """Map IN gamma/beta onto this framework's InstanceNorm param shapes:
    (C,) for the corrected per-channel norm; per-H tfa axis=1 artifacts get
    (H, 1, 1) for quirk_axis1=True models."""
    if gamma.size == channels and gamma.ndim == 1:
        return {"scale": gamma, "bias": beta}
    return {
        "scale": gamma.reshape(-1, 1, 1),
        "bias": beta.reshape(-1, 1, 1),
    }


def import_cyclegan_generator(h5_path: str | Path) -> dict:
    """Reference CycleGAN generator save_weights .h5 -> {"params"} for
    models/cyclegan.Generator.

    Weighted-layer order (cyclegan/CycleGAN.py:161-183): conv_c7_s1(64),
    d_conv(128), d_conv(256), N x ResBlock(256), u_conv(128), u_conv(64),
    conv_c7_s1(3) — each block contributing (conv kernel, conv bias, IN
    gamma, IN beta) and each ResBlock contributing conv1, in1, conv2, in2
    (the reference ResBlock's attribute order, :62-70)."""
    stream = _read_save_weights_h5(h5_path)
    vals = [a for _, a in stream]
    if len(vals) % 4 != 0 or len(vals) < 6 * 4:
        raise ValueError(
            f"unexpected weight count {len(vals)} for a CycleGAN generator"
        )
    n_res = (len(vals) - 6 * 4) // 8
    it = iter(vals)

    def conv_block():
        k, b = next(it), next(it)
        g, beta = next(it), next(it)
        return k, b, g, beta

    params: dict = {}

    def take(name_conv, name_in, transpose=False, conv_key="Conv_0"):
        k, b, g, beta = conv_block()
        if transpose:
            k = convt_kernel_to_flax(k)
        params[name_conv] = {conv_key: {"kernel": k, "bias": b}}
        params[name_in] = _in_params(g, beta, k.shape[-1])

    take("stem_conv", "stem_in")
    take("down0", "down0_in")
    take("down1", "down1_in")
    for i in range(n_res):
        k1, b1, g1, be1 = conv_block()
        k2, b2, g2, be2 = conv_block()
        params[f"res{i}"] = {
            "conv1": {"Conv_0": {"kernel": k1, "bias": b1}},
            "in1": _in_params(g1, be1, k1.shape[-1]),
            "conv2": {"Conv_0": {"kernel": k2, "bias": b2}},
            "in2": _in_params(g2, be2, k2.shape[-1]),
        }
    take("up0", "up0_in", transpose=True, conv_key="ConvTranspose_0")
    take("up1", "up1_in", transpose=True, conv_key="ConvTranspose_0")
    take("to_rgb", "to_rgb_in")
    return {"params": params}


def import_cyclegan_discriminator(h5_path: str | Path) -> dict:
    """Reference PatchGAN save_weights .h5 -> {"params"} for
    models/cyclegan.Discriminator.

    Weighted-layer order (cyclegan/CycleGAN.py:112-126): k_conv(64, no norm)
    -> k_conv(128/256/512, each conv + IN) -> final Conv2D(1, 4x4 s1); IN
    gamma/beta map onto conv{i}_in scale/bias ((C,) corrected or (H,1,1)
    tfa-axis=1 artifacts, decided by shape)."""
    vals = [a for _, a in _read_save_weights_h5(h5_path)]
    if len(vals) != 16:
        raise ValueError(
            f"unexpected weight count {len(vals)} for a CycleGAN "
            f"discriminator (expected 16)"
        )
    it = iter(vals)
    params: dict = {}
    params["conv0"] = {"Conv_0": {"kernel": next(it), "bias": next(it)}}
    for i in (1, 2, 3):
        k, b = next(it), next(it)
        g, beta = next(it), next(it)
        params[f"conv{i}"] = {"Conv_0": {"kernel": k, "bias": b}}
        params[f"conv{i}_in"] = _in_params(g, beta, k.shape[-1])
    params["head"] = {"Conv_0": {"kernel": next(it), "bias": next(it)}}
    return {"params": params}


IMPORTERS = {
    "sndcgan-gen": import_sndcgan_generator,
    "sndcgan-disc": import_sndcgan_discriminator,
    "wgan-gen": import_wgan_generator,
    "wgan-critic": import_wgan_critic,
    "cyclegan-gen": import_cyclegan_generator,
    "cyclegan-disc": import_cyclegan_discriminator,
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
