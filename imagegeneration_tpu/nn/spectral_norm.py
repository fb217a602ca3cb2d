"""Spectral normalization with fused power iteration.

The reference's "SNDCGAN" names the SN-GAN paper as its target but contains no
spectral-norm layer (see /root/reference/sndcgan/SNDCGAN.py:69-128 and
README.md:11,23 — the discriminator is a plain conv stack). The BASELINE
north-star explicitly asks for the spectral-norm discriminator with the power
iteration fused into the train step, so this module is a *new* component, not
a port.

Design (Miyato et al. 2018, arXiv:1802.05957):
- the conv kernel (kh, kw, in, out) is viewed as a matrix W of shape
  (kh*kw*in, out);
- a persistent left-singular-vector estimate `u` (out,) lives in the mutable
  `spectral` collection and is refreshed by one power-iteration step per
  forward pass (v = normalize(W u); sigma = v^T W u; u <- normalize(W^T v));
- the layer computes conv(x, W / sigma).

Because the whole train step is one jitted XLA program, the power iteration
(two skinny matvecs + a dot) fuses into the step — there is no separate
"spectral norm pass" as in eager frameworks. sigma is computed in float32
regardless of the compute dtype.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as fnn

from imagegeneration_tpu.nn.layers import KERAS_GLOROT_UNIFORM

Dtype = Any

_EPS = 1e-12


def _l2_normalize(v: jax.Array) -> jax.Array:
    return v * jax.lax.rsqrt(jnp.sum(v * v) + _EPS)


def power_iteration(w_mat: jax.Array, u: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One power-iteration step. Returns (sigma, new_u).

    w_mat: (M, N) float32; u: (N,) float32 current right-vector estimate.
    """
    v = _l2_normalize(w_mat @ u)  # (M,)
    new_u = _l2_normalize(w_mat.T @ v)  # (N,)
    sigma = v @ (w_mat @ new_u)
    return sigma, new_u


class SpectralNormConv(fnn.Module):
    """2D conv with spectrally-normalized kernel (NHWC, TF-SAME padding).

    The `u` estimate is stored in the mutable "spectral" collection; pass
    `update_stats=False` for inference (uses the stored `u` without refresh).
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
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        kh, kw = self.kernel_size
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (kh, kw, in_features, self.features),
            self.param_dtype,
        )
        u_var = self.variable(
            "spectral",
            "u",
            lambda key, shape: _l2_normalize(jax.random.normal(key, shape)),
            self.make_rng("params") if self.is_initializing() else None,
            (self.features,),
        )

        w_mat = kernel.reshape(-1, self.features).astype(jnp.float32)
        u = u_var.value.astype(jnp.float32)
        sigma, new_u = power_iteration(w_mat, u)
        if update_stats and not self.is_initializing():
            u_var.value = jax.lax.stop_gradient(new_u)
        sigma = jax.lax.stop_gradient(jnp.maximum(sigma, _EPS))
        w_sn = (kernel.astype(jnp.float32) / sigma).astype(
            self.dtype or kernel.dtype
        )

        dn = jax.lax.conv_dimension_numbers(
            x.shape, w_sn.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype),
            w_sn,
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=dn,
        )
        if self.use_bias:
            bias = self.param(
                "bias", jax.nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias.astype(y.dtype)
        return y


class SpectralNormDense(fnn.Module):
    """Dense layer with spectrally-normalized kernel (for the D output head)."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = KERAS_GLOROT_UNIFORM
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (x.shape[-1], self.features),
            self.param_dtype,
        )
        u_var = self.variable(
            "spectral",
            "u",
            lambda key, shape: _l2_normalize(jax.random.normal(key, shape)),
            self.make_rng("params") if self.is_initializing() else None,
            (self.features,),
        )
        w_mat = kernel.astype(jnp.float32)
        sigma, new_u = power_iteration(w_mat, u_var.value.astype(jnp.float32))
        if update_stats and not self.is_initializing():
            u_var.value = jax.lax.stop_gradient(new_u)
        sigma = jax.lax.stop_gradient(jnp.maximum(sigma, _EPS))
        w_sn = (w_mat / sigma).astype(self.dtype or kernel.dtype)
        y = x.astype(w_sn.dtype) @ w_sn
        if self.use_bias:
            bias = self.param(
                "bias", jax.nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias.astype(y.dtype)
        return y
