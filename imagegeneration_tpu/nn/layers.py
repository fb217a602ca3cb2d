"""Flax building blocks matching the TF/Keras layer semantics of the reference.

The reference builds every model out of stock Keras layers (e.g.
/root/reference/sndcgan/SNDCGAN.py:25-128, /root/reference/wasserstein_gan/WGAN.py:53-134,
/root/reference/cyclegan/CycleGAN.py:29-183). This module provides the same
vocabulary as idiomatic Flax Linen modules, pinning down every default that
affects numerics:

- kernel init: Keras `glorot_uniform` (Flax defaults to lecun_normal), bias zeros;
- BatchNorm: momentum 0.99, epsilon 1e-3 (Keras) vs Flax's 1e-5;
- SAME padding: `lax` string padding has TF semantics (extra pad on bottom/right
  for even kernels), which is what Keras produces;
- InstanceNorm: the reference uses `tfa.layers.InstanceNormalization(axis=1)`
  on NHWC tensors (cyclegan/CycleGAN.py:65-66), i.e. it normalizes treating the
  *height* axis as channels — an upstream quirk. The corrected per-channel norm
  is the default here; `quirk_axis1=True` reproduces the reference behavior.

All modules are NHWC, accept a compute `dtype` (bfloat16 on the TPU hot path)
and keep parameters in `param_dtype` (float32).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn

Dtype = Any

# Keras initializer equivalents.
KERAS_GLOROT_UNIFORM = jax.nn.initializers.glorot_uniform()
KERAS_RANDOM_NORMAL_002 = jax.nn.initializers.normal(stddev=0.02)
def _keras_random_uniform(key, shape, dtype=jnp.float32):
    """Keras 'random_uniform' initializer string default: U(-0.05, 0.05)."""
    return jax.random.uniform(key, shape, dtype, minval=-0.05, maxval=0.05)


KERAS_RANDOM_UNIFORM = _keras_random_uniform


def leaky_relu(x: jax.Array, alpha: float = 0.3) -> jax.Array:
    """Keras LeakyReLU (default alpha 0.3; the reference uses 0.1/0.2)."""
    return jax.nn.leaky_relu(x, negative_slope=alpha)


def reflection_pad_2d(x: jax.Array, padding: tuple[int, int] = (1, 1)) -> jax.Array:
    """REFLECT-pad H and W of an NHWC tensor.

    Mirrors the reference's ReflectionPadding2D (cyclegan/CycleGAN.py:37-57),
    which pads [[0,0],[h,h],[w,w],[0,0]] with mode REFLECT.
    """
    w_pad, h_pad = padding
    return jnp.pad(
        x, [(0, 0), (h_pad, h_pad), (w_pad, w_pad), (0, 0)], mode="reflect"
    )


class Dense(fnn.Module):
    """Dense layer with Keras defaults (glorot_uniform kernel, zeros bias)."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = KERAS_GLOROT_UNIFORM
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return fnn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=jax.nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class Conv(fnn.Module):
    """2D convolution, NHWC, TF-SAME/VALID padding, Keras init defaults."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: str | Sequence[tuple[int, int]] = "SAME"
    use_bias: bool = True
    kernel_init: Callable = KERAS_GLOROT_UNIFORM
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return fnn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=jax.nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class ConvTranspose(fnn.Module):
    """2D transposed convolution, NHWC, SAME padding => out = in * stride.

    Fills the role of Keras Conv2DTranspose in the reference generators
    (sndcgan/SNDCGAN.py:36-61, wasserstein_gan/WGAN.py:116-127,
    cyclegan/CycleGAN.py:152). Implemented via `lax.conv_transpose`
    (fractionally-strided conv) — architecturally equivalent to Keras's
    gradient-of-conv formulation (same output shape and parameter count;
    kernels are learned so the orientation difference is immaterial).
    """

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: str = "SAME"
    use_bias: bool = True
    kernel_init: Callable = KERAS_GLOROT_UNIFORM
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return fnn.ConvTranspose(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=jax.nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class BatchNorm(fnn.Module):
    """BatchNorm with Keras defaults: momentum 0.99, epsilon 1e-3.

    `use_running_average=True` reproduces Keras `training=False` inference
    behavior; batch statistics live in the `batch_stats` collection.
    """

    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return fnn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class InstanceNorm(fnn.Module):
    """Instance normalization over spatial dims of an NHWC tensor.

    Default: per-(sample, channel) statistics over (H, W) — the textbook
    CycleGAN norm. `quirk_axis1=True` reproduces the reference's
    `tfa.InstanceNormalization(axis=1)` on NHWC (cyclegan/CycleGAN.py:65-66),
    which treats the H axis as "channels" and normalizes each H-slice over
    (W, C) with per-H-position scale/offset.

    beta/gamma use the Keras "random_uniform" (U(-0.05,0.05)) initializer to
    match the reference.
    """

    epsilon: float = 1e-3  # tfa InstanceNormalization default epsilon=1e-3
    quirk_axis1: bool = False
    use_scale: bool = True
    use_bias: bool = True
    # "xla" | "pallas" | "auto": route the corrected per-channel path through
    # the fused single-HBM-pass Pallas kernel (ops/pallas/instance_norm).
    backend: str = "xla"
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if (
            not self.quirk_axis1
            and self.backend != "xla"
            and self.use_scale
            and self.use_bias
        ):
            from imagegeneration_tpu.ops.pallas.instance_norm import instance_norm

            gamma = self.param(
                "scale", KERAS_RANDOM_UNIFORM, (x.shape[-1],), self.param_dtype
            )
            beta = self.param(
                "bias", KERAS_RANDOM_UNIFORM, (x.shape[-1],), self.param_dtype
            )
            y = instance_norm(
                x, gamma, beta, self.epsilon, False, self.backend
            )
            return y.astype(self.dtype or x.dtype)
        if self.quirk_axis1:
            # Per-H-position parameters, normalized over (W, C).
            reduction_axes = (2, 3)
            param_shape = (x.shape[1], 1, 1)  # broadcasts over (H, W, C)
        else:
            # Per-channel parameters, normalized over (H, W).
            reduction_axes = (1, 2)
            param_shape = (x.shape[-1],)
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=reduction_axes, keepdims=True)
        var = jnp.var(x32, axis=reduction_axes, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            gamma = self.param(
                "scale", KERAS_RANDOM_UNIFORM, param_shape, self.param_dtype
            )
            y = y * gamma.astype(jnp.float32)
        if self.use_bias:
            beta = self.param(
                "bias", KERAS_RANDOM_UNIFORM, param_shape, self.param_dtype
            )
            y = y + beta.astype(jnp.float32)
        return y.astype(self.dtype or orig_dtype)


class Dropout(fnn.Module):
    """Inverted dropout (Keras semantics: scale kept units by 1/(1-rate))."""

    rate: float

    @fnn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        return fnn.Dropout(rate=self.rate, deterministic=deterministic)(x)


class ResBlock(fnn.Module):
    """CycleGAN residual block with the reference's exact (quirky) op order.

    conv3x3 -> IN -> ReLU -> conv3x3 -> add(residual) -> ReLU -> IN
    (cyclegan/CycleGAN.py:84-92 — note the *post-add* normalization and the
    missing pre-add norm on the second conv, faithfully reproduced).
    """

    features: int
    quirk_axis1: bool = False
    in_backend: str = "xla"
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fx = Conv(
            self.features, (3, 3), (1, 1), "SAME",
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv1",
        )(x)
        fx = InstanceNorm(
            quirk_axis1=self.quirk_axis1, backend=self.in_backend,
            dtype=self.dtype, param_dtype=self.param_dtype, name="in1",
        )(fx)
        fx = jax.nn.relu(fx)
        fx = Conv(
            self.features, (3, 3), (1, 1), "SAME",
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv2",
        )(fx)
        out = jax.nn.relu(x + fx)
        out = InstanceNorm(
            quirk_axis1=self.quirk_axis1, backend=self.in_backend,
            dtype=self.dtype, param_dtype=self.param_dtype, name="in2",
        )(out)
        return out
