"""WGAN generator / critic — TPU-native Flax rebuild.

Architecture parity targets (cited into /root/reference/):
- critic: wasserstein_gan/WGAN.py:53-101 — 7 SAME convs
  (64@3x3s1, 128@4x4s2, 128@3x3s1, 256@4x4s2, 256@3x3s1, 512@4x4s2, 512@3x3s1),
  every conv with RandomNormal(0.02) kernel init and a ±0.01 clip constraint,
  each followed by BatchNorm + LeakyReLU (alpha 0.2 for the first five blocks,
  0.1 for the last two — :63-93), then Flatten + Dense(1) (default init, no
  constraint).
- generator: wasserstein_gan/WGAN.py:105-134 — Dense(512*H/8*W/8, no bias,
  default init) + LeakyReLU(0.2) + reshape, 3x[ConvT 4x4 s2 SAME no-bias
  RandomNormal(0.02) + BN + LeakyReLU(0.2)], then a plain Conv2D 3x3 s1 SAME
  no-bias tanh head (NOT a ConvT — a deliberate difference from SNDCGAN,
  faithfully kept).

The clip constraint itself is enforced in the train step (after each RMSprop
apply, exactly where Keras's kernel_constraint runs); `clip_kernel_paths`
exposes which parameters carry it.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

from imagegeneration_tpu.nn.layers import (
    KERAS_RANDOM_NORMAL_002,
    BatchNorm,
    Conv,
    ConvTranspose,
    Dense,
)

CLIP_VALUE = 0.01  # wasserstein_gan/WGAN.py:57


@dataclasses.dataclass(frozen=True)
class WGANConfig:
    image_size: tuple[int, int, int] = (144, 256, 3)  # wasserstein_gan/Trainer.py:12
    z_size: int = 128  # WGAN.py:173
    base_width: int = 512
    dtype: Any = jnp.float32


# (filters, kernel, stride, leaky_alpha) — WGAN.py:60-93.
_CRITIC_TRUNK = (
    (64, (3, 3), (1, 1), 0.2),
    (128, (4, 4), (2, 2), 0.2),
    (128, (3, 3), (1, 1), 0.2),
    (256, (4, 4), (2, 2), 0.2),
    (256, (3, 3), (1, 1), 0.2),
    (512, (4, 4), (2, 2), 0.1),
    (512, (3, 3), (1, 1), 0.1),
)


class Critic(fnn.Module):
    """Wasserstein critic; returns (B, 1) scores (no sigmoid)."""

    cfg: WGANConfig

    @fnn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        dt = self.cfg.dtype
        x = x.astype(dt)
        for i, (feats, ksize, stride, alpha) in enumerate(_CRITIC_TRUNK):
            x = Conv(
                feats, ksize, stride, "SAME",
                kernel_init=KERAS_RANDOM_NORMAL_002, dtype=dt, name=f"conv{i}",
            )(x)
            x = BatchNorm(
                use_running_average=not train, dtype=dt, name=f"conv{i}_bn"
            )(x)
            x = jax.nn.leaky_relu(x, negative_slope=alpha)
        x = x.reshape(x.shape[0], -1)
        return Dense(1, dtype=dt, name="head")(x).astype(jnp.float32)


class Generator(fnn.Module):
    """WGAN generator: z -> (H, W, 3) in [-1, 1]."""

    cfg: WGANConfig

    @fnn.compact
    def __call__(self, z: jax.Array, train: bool = True) -> jax.Array:
        cfg = self.cfg
        h, w, c = cfg.image_size
        h8, w8 = h // 8, w // 8
        base = cfg.base_width
        dt = cfg.dtype

        x = Dense(base * h8 * w8, use_bias=False, dtype=dt, name="stem")(
            z.astype(dt)
        )
        x = jax.nn.leaky_relu(x, negative_slope=0.2)
        x = x.reshape(x.shape[0], h8, w8, base)

        for i, feats in enumerate((base // 2, base // 4, base // 8)):
            x = ConvTranspose(
                feats, (4, 4), (2, 2), "SAME", use_bias=False,
                kernel_init=KERAS_RANDOM_NORMAL_002, dtype=dt, name=f"up{i}",
            )(x)
            x = BatchNorm(
                use_running_average=not train, dtype=dt, name=f"up{i}_bn"
            )(x)
            x = jax.nn.leaky_relu(x, negative_slope=0.2)

        x = Conv(
            c, (3, 3), (1, 1), "SAME", use_bias=False,
            kernel_init=KERAS_RANDOM_NORMAL_002, dtype=dt, name="to_rgb",
        )(x)
        return jnp.tanh(x.astype(jnp.float32))


def clip_critic_kernels(c_params: Any, clip: float = CLIP_VALUE) -> Any:
    """Apply the ±clip hypercube constraint to every conv kernel — the Keras
    kernel_constraint semantics (WGAN.py:33-44, applied :60-93). BN params,
    conv biases and the Dense head are NOT constrained (faithful)."""

    def _clip(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        is_conv_kernel = (
            any(n.startswith("conv") and not n.endswith("_bn") for n in names)
            and names[-1] == "kernel"
        )
        return jnp.clip(leaf, -clip, clip) if is_conv_kernel else leaf

    return jax.tree_util.tree_map_with_path(_clip, c_params)


def critic_bn_mask(c_params: Any) -> Any:
    """True for BatchNorm scale/bias — the only critic params the combined
    generator update trains (WGAN.py:140-142: every layer frozen EXCEPT
    BatchNormalization)."""

    def _mask(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        return any(n.endswith("_bn") for n in names)

    return jax.tree_util.tree_map_with_path(_mask, c_params)


def make_models(cfg: WGANConfig) -> tuple[Generator, Critic]:
    return Generator(cfg), Critic(cfg)


def min_sharded_height(cfg: WGANConfig) -> int:
    """Smallest spatially-sharded feature height: the critic's three 4x4 s2
    convs (and the generator's H/8 stem) bottom out at H/8. Input to
    core/mesh.check_spatial_partition (degenerate-GSPMD guard)."""
    return cfg.image_size[0] // 8
