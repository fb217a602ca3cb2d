"""CycleGAN "perception distance" evaluation (VGG16-feature MSE).

Parity with cyclegan/generator_evaluation.py:
- feature extractor: VGG16 truncated at `layers[15]` — the ReLU output of
  block5_conv1 (:124-125). Implemented as a Flax module (conv 3x3 stacks
  64,64 | 128,128 | 256,256,256 | 512,512,512 | 512 with 2x2 maxpools between
  blocks, ending after block5_conv1).
- weights: the reference downloads imagenet weights; this environment has no
  egress, so weights load from a Keras-format .h5 if present
  (IMAGEGEN_VGG16_WEIGHTS env var or `weights_path=`), otherwise a
  fixed-seed random init is used — random VGG features are a valid *relative*
  perceptual metric (documented delta; absolute values differ from the
  reference's).
- per-image PD: mean squared difference of activations between the input and
  its translation (:38-45), computed jitted and batched on device (the
  reference loops per image through model.predict).
- preprocessing quirks kept faithfully: images stay in [-1, 1] (NO VGG
  caffe preprocessing — :126,137 feed the normalized dataset straight in) and
  resizing to 224x224 is NEAREST-neighbor (`skimage.resize(image, shape, 0)`
  — order 0 — :48-50).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

# Conv plan up to block5_conv1 (Keras VGG16 layers[1..15]).
_VGG_PLAN = (
    (64, 64),
    (128, 128),
    (256, 256, 256),
    (512, 512, 512),
    (512,),  # block5_conv1 only — layers[15] cutoff
)


class VGG16Features(fnn.Module):
    """VGG16 truncated at block5_conv1 (inclusive), NHWC."""

    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        for b, widths in enumerate(_VGG_PLAN):
            for c, width in enumerate(widths):
                x = fnn.Conv(
                    width, (3, 3), padding="SAME",
                    dtype=self.dtype, name=f"block{b + 1}_conv{c + 1}",
                )(x)
                x = jax.nn.relu(x)
            if b < len(_VGG_PLAN) - 1:
                x = fnn.max_pool(x, (2, 2), strides=(2, 2))
        return x.astype(jnp.float32)


def load_vgg16_params(weights_path: str | None = None) -> dict:
    """Keras-format .h5 weights if available, else fixed-seed random init."""
    weights_path = weights_path or os.environ.get("IMAGEGEN_VGG16_WEIGHTS")
    model = VGG16Features()
    variables = model.init(
        jax.random.key(1715), jnp.zeros((1, 224, 224, 3))
    )
    if not weights_path or not os.path.exists(weights_path):
        return variables  # deterministic random features (documented delta)
    import h5py

    params = dict(variables["params"])
    with h5py.File(weights_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        for name in list(params):
            if name not in root:
                continue
            g = root[name]
            # Keras h5 layout: <layer>/<layer>/kernel:0, bias:0
            inner = g[name] if name in g else g
            params[name] = {
                "kernel": jnp.asarray(np.asarray(inner["kernel:0"])),
                "bias": jnp.asarray(np.asarray(inner["bias:0"])),
            }
    return {"params": params}


def nearest_resize_224(images: jax.Array) -> jax.Array:
    """skimage.resize(image, (224,224,3), order=0) equivalent (NEAREST)."""
    b = images.shape[0]
    return jax.image.resize(
        images, (b, 224, 224, images.shape[-1]), method="nearest"
    )


def make_pd_fn(vgg_variables: dict):
    """Jitted batched PD: (inputs, outputs in [-1,1], any HxW) -> (B,) PDs."""
    model = VGG16Features()

    @jax.jit
    def pd(inputs: jax.Array, outputs: jax.Array) -> jax.Array:
        a = model.apply(vgg_variables, nearest_resize_224(inputs))
        b = model.apply(vgg_variables, nearest_resize_224(outputs))
        diff = (a - b).reshape(a.shape[0], -1)
        return jnp.mean(diff * diff, axis=-1)

    return pd


def calculate_pd(pd_fn, image_input: np.ndarray, image_output: np.ndarray) -> float:
    """Single-pair API mirroring the reference's calculate_pd (:38-45)."""
    return float(
        pd_fn(image_input[None].astype(np.float32),
              image_output[None].astype(np.float32))[0]
    )
