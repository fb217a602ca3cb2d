"""InceptionV3 pool-feature extractor for standard FID (optional, modern).

The reference's FID uses its own discriminator as the feature extractor
(sndcgan/generator_evaluation.py:134-138) — that stays the faithful default
in evalx/fid.py. This module adds the STANDARD Inception-pool3 FID for
comparability with the wider literature: InceptionV3 (Szegedy et al. 2015)
up to the global average pool (2048-d), implemented in Flax/NHWC.

Weight import: convolutions are named `conv2d`, `conv2d_1`, ... and batch
norms `batch_normalization`, `batch_normalization_1`, ... in the exact
creation order of tf.keras.applications.InceptionV3, so a Keras
`save_weights` .h5 of that model (e.g. the released imagenet weights) loads
directly by name (`load_inception_params`). This environment has no egress,
so absent a weights file a fixed-seed random init is used — valid only as a
relative metric (documented delta; tests import TF-exported random weights
to prove the loader + architecture byte-for-byte).

BN semantics match Keras applications: axis=-1, scale=False (no gamma),
epsilon=1e-3, inference mode (moving statistics).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

INCEPTION_SIZE = 299


class InceptionV3Features(fnn.Module):
    """InceptionV3 trunk -> (B, 2048) pooled features. Input: NHWC in [-1,1]
    at 299x299 (use `prepare_images` for resize)."""

    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        counter = {"i": 0}

        def cbr(x, filters, kh, kw, strides=(1, 1), padding="SAME"):
            i = counter["i"]
            counter["i"] += 1
            suffix = "" if i == 0 else f"_{i}"
            x = fnn.Conv(
                filters, (kh, kw), strides=strides, padding=padding,
                use_bias=False, dtype=self.dtype, name=f"conv2d{suffix}",
            )(x)
            x = fnn.BatchNorm(
                use_running_average=True, use_scale=False, epsilon=1e-3,
                dtype=self.dtype, name=f"batch_normalization{suffix}",
            )(x)
            return jax.nn.relu(x)

        def maxpool(x):
            return fnn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        def avgpool_same(x):
            return fnn.avg_pool(
                x, (3, 3), strides=(1, 1), padding="SAME",
                count_include_pad=False,
            )

        x = x.astype(self.dtype)
        # ---- stem
        x = cbr(x, 32, 3, 3, strides=(2, 2), padding="VALID")
        x = cbr(x, 32, 3, 3, padding="VALID")
        x = cbr(x, 64, 3, 3)
        x = maxpool(x)
        x = cbr(x, 80, 1, 1, padding="VALID")
        x = cbr(x, 192, 3, 3, padding="VALID")
        x = maxpool(x)

        # ---- mixed0..2 (35x35)
        for pool_width in (32, 64, 64):
            b1 = cbr(x, 64, 1, 1)
            b5 = cbr(cbr(x, 48, 1, 1), 64, 5, 5)
            b3 = cbr(cbr(cbr(x, 64, 1, 1), 96, 3, 3), 96, 3, 3)
            bp = cbr(avgpool_same(x), pool_width, 1, 1)
            x = jnp.concatenate([b1, b5, b3, bp], axis=-1)

        # ---- mixed3 (reduce to 17x17)
        b3 = cbr(x, 384, 3, 3, strides=(2, 2), padding="VALID")
        bd = cbr(cbr(x, 64, 1, 1), 96, 3, 3)
        bd = cbr(bd, 96, 3, 3, strides=(2, 2), padding="VALID")
        x = jnp.concatenate([b3, bd, maxpool(x)], axis=-1)

        # ---- mixed4..7 (17x17)
        for width in (128, 160, 160, 192):
            b1 = cbr(x, 192, 1, 1)
            b7 = cbr(cbr(cbr(x, width, 1, 1), width, 1, 7), 192, 7, 1)
            bd = cbr(x, width, 1, 1)
            bd = cbr(cbr(bd, width, 7, 1), width, 1, 7)
            bd = cbr(cbr(bd, width, 7, 1), 192, 1, 7)
            bp = cbr(avgpool_same(x), 192, 1, 1)
            x = jnp.concatenate([b1, b7, bd, bp], axis=-1)

        # ---- mixed8 (reduce to 8x8)
        b3 = cbr(cbr(x, 192, 1, 1), 320, 3, 3, strides=(2, 2), padding="VALID")
        b7 = cbr(cbr(cbr(x, 192, 1, 1), 192, 1, 7), 192, 7, 1)
        b7 = cbr(b7, 192, 3, 3, strides=(2, 2), padding="VALID")
        x = jnp.concatenate([b3, b7, maxpool(x)], axis=-1)

        # ---- mixed9..10 (8x8)
        for _ in range(2):
            b1 = cbr(x, 320, 1, 1)
            b3 = cbr(x, 384, 1, 1)
            b3 = jnp.concatenate(
                [cbr(b3, 384, 1, 3), cbr(b3, 384, 3, 1)], axis=-1
            )
            bd = cbr(cbr(x, 448, 1, 1), 384, 3, 3)
            bd = jnp.concatenate(
                [cbr(bd, 384, 1, 3), cbr(bd, 384, 3, 1)], axis=-1
            )
            bp = cbr(avgpool_same(x), 192, 1, 1)
            x = jnp.concatenate([b1, b3, bd, bp], axis=-1)

        # global average pool -> (B, 2048)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


def prepare_images(images: jax.Array) -> jax.Array:
    """[-1,1] NHWC images, any HxW -> 299x299 bilinear (standard FID input)."""
    b, _, _, c = images.shape
    return jax.image.resize(
        images, (b, INCEPTION_SIZE, INCEPTION_SIZE, c), method="bilinear"
    )


def load_inception_params(weights_path: str | None = None) -> dict:
    """Keras save_weights .h5 (tf.keras.applications.InceptionV3 naming) if
    available, else a fixed-seed random init (relative-metric mode)."""
    explicit = weights_path is not None
    weights_path = weights_path or os.environ.get("IMAGEGEN_INCEPTION_WEIGHTS")
    model = InceptionV3Features()
    variables = model.init(
        jax.random.key(1980),
        jnp.zeros((1, INCEPTION_SIZE, INCEPTION_SIZE, 3)),
    )
    if not weights_path or not os.path.exists(weights_path):
        if explicit:
            # An explicitly passed path that does not exist is a user error —
            # silently computing "Inception FID" from random features would be
            # meaningless as an absolute metric (ADVICE r2).
            raise FileNotFoundError(
                f"Inception weights not found: {weights_path!r}"
            )
        print(
            "[inception] no weights available — using fixed-seed random init "
            "(valid as a RELATIVE metric only)", flush=True,
        )
        return variables
    import h5py

    params = jax.tree.map(np.asarray, dict(variables["params"]))
    stats = jax.tree.map(np.asarray, dict(variables["batch_stats"]))
    with h5py.File(weights_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f

        def inner(name):
            g = root[name]
            return g[name] if name in g else g

        for name in params:
            if name.startswith("conv2d"):
                params[name] = {
                    "kernel": np.asarray(inner(name)["kernel:0"])
                }
            else:  # batch_normalization*
                g = inner(name)
                params[name] = {"bias": np.asarray(g["beta:0"])}
                stats[name] = {
                    "mean": np.asarray(g["moving_mean:0"]),
                    "var": np.asarray(g["moving_variance:0"]),
                }
    as_jnp = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    return {"params": as_jnp(params), "batch_stats": as_jnp(stats)}


def make_feature_fn(variables: dict):
    """Jitted (images in [-1,1], any HxW) -> (B, 2048) pool features."""
    model = InceptionV3Features()

    @jax.jit
    def features(images: jax.Array) -> jax.Array:
        return model.apply(variables, prepare_images(images))

    return features
