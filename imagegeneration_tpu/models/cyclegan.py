"""CycleGAN resnet generator / PatchGAN discriminator — TPU-native rebuild.

Architecture parity targets (cited into /root/reference/cyclegan/CycleGAN.py):
- generator (:161-183, Johnson-style):
  conv7x7 s1 SAME 64 + IN + ReLU (:129-136)
  -> 2x downsample [ReflectionPad(1,1) + conv3x3 s2 VALID + IN + ReLU] 128,256
     (:139-147)
  -> 9x ResBlock(256) with the reference's post-add-norm op order (:60-92)
  -> 2x upsample [ConvT 3x3 s2 SAME + IN + ReLU] 128,64 (:150-157)
  -> conv7x7 s1 SAME 3 + IN + Tanh (:129-136,181 — note the InstanceNorm
     BEFORE the tanh, a faithful quirk of conv_c7_s1(use_tanh=True)).
- discriminator (:95-126, PatchGAN): 4x4 s2 VALID convs 64(no norm),128,256,
  512, each + LeakyReLU(0.2) (+IN for all but the first), then 4x4 s1 VALID
  conv to a 1-channel patch-logit map. At 128x128 input the output is
  (B, 3, 3, 1) VALID-shrunk patch logits.

The reference's InstanceNormalization(axis=1) height-axis quirk is off by
default (corrected per-channel IN); pass quirk_axis1=True for bug-compatible
behavior (see nn/layers.py InstanceNorm).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

from imagegeneration_tpu.nn.layers import (
    Conv,
    ConvTranspose,
    InstanceNorm,
    ResBlock,
    reflection_pad_2d,
)


@dataclasses.dataclass(frozen=True)
class CycleGANConfig:
    image_size: tuple[int, int, int] = (128, 128, 3)  # cyclegan/Trainer.py:5
    base_width: int = 64
    n_res_blocks: int = 9  # CycleGAN.py:168-176
    quirk_axis1: bool = False
    # InstanceNorm backend: "auto" uses the fused Pallas kernel on TPU where
    # the block fits VMEM (all 18 res-block INs at the reference's 128px),
    # falling back to XLA elsewhere. "xla" forces the fallback.
    in_backend: str = "auto"
    dtype: Any = jnp.float32


class Generator(fnn.Module):
    """Resnet generator: (B,H,W,3) in [-1,1] -> (B,H,W,3) in [-1,1]."""

    cfg: CycleGANConfig

    @fnn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        cfg = self.cfg
        dt = cfg.dtype
        q = cfg.quirk_axis1
        base = cfg.base_width
        x = x.astype(dt)

        # conv_c7_s1(64)
        x = Conv(base, (7, 7), (1, 1), "SAME", dtype=dt, name="stem_conv")(x)
        x = InstanceNorm(quirk_axis1=q, backend=cfg.in_backend, dtype=dt, name="stem_in")(x)
        x = jax.nn.relu(x)

        # d_conv(128), d_conv(256): ReflectionPad + 3x3 s2 VALID + IN + ReLU
        for i, feats in enumerate((base * 2, base * 4)):
            x = reflection_pad_2d(x, (1, 1))
            x = Conv(feats, (3, 3), (2, 2), "VALID", dtype=dt, name=f"down{i}")(x)
            x = InstanceNorm(quirk_axis1=q, backend=cfg.in_backend, dtype=dt, name=f"down{i}_in")(x)
            x = jax.nn.relu(x)

        for i in range(cfg.n_res_blocks):
            x = ResBlock(base * 4, quirk_axis1=q, in_backend=cfg.in_backend, dtype=dt, name=f"res{i}")(x)

        # u_conv(128), u_conv(64): ConvT 3x3 s2 SAME + IN + ReLU
        for i, feats in enumerate((base * 2, base)):
            x = ConvTranspose(feats, (3, 3), (2, 2), "SAME", dtype=dt, name=f"up{i}")(x)
            x = InstanceNorm(quirk_axis1=q, backend=cfg.in_backend, dtype=dt, name=f"up{i}_in")(x)
            x = jax.nn.relu(x)

        # conv_c7_s1(3, use_tanh=True): conv + IN + tanh (IN before tanh!)
        x = Conv(3, (7, 7), (1, 1), "SAME", dtype=dt, name="to_rgb")(x)
        x = InstanceNorm(quirk_axis1=q, backend=cfg.in_backend, dtype=dt, name="to_rgb_in")(x)
        return jnp.tanh(x.astype(jnp.float32))


# (filters, use_norm) for the PatchGAN trunk — CycleGAN.py:112-122.
_DISC_TRUNK = ((64, False), (128, True), (256, True), (512, True))


class Discriminator(fnn.Module):
    """PatchGAN: (B,H,W,3) -> (B,h,w,1) patch logits (VALID 4x4 s2 stack)."""

    cfg: CycleGANConfig

    @fnn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        cfg = self.cfg
        dt = cfg.dtype
        x = x.astype(dt)
        for i, (feats, use_norm) in enumerate(_DISC_TRUNK):
            if min(x.shape[1], x.shape[2]) < 4:
                raise ValueError(
                    f"PatchGAN input too small: spatial dims shrank to "
                    f"{x.shape[1]}x{x.shape[2]} before conv{i}; the VALID "
                    f"4x4 stack needs >= 94px input (reference uses 128)."
                )
            x = Conv(feats, (4, 4), (2, 2), "VALID", dtype=dt, name=f"conv{i}")(x)
            if use_norm:
                x = InstanceNorm(
                    quirk_axis1=cfg.quirk_axis1, backend=cfg.in_backend,
                    dtype=dt, name=f"conv{i}_in",
                )(x)
            x = jax.nn.leaky_relu(x, negative_slope=0.2)
        if min(x.shape[1], x.shape[2]) < 4:
            raise ValueError(
                f"PatchGAN trunk output {x.shape[1]}x{x.shape[2]} smaller than "
                f"the 4x4 head; input resolution too small (needs >= 94px)."
            )
        x = Conv(1, (4, 4), (1, 1), "VALID", dtype=dt, name="head")(x)
        return x.astype(jnp.float32)


def make_models(cfg: CycleGANConfig):
    """(generator_g, generator_f, discriminator_x, discriminator_y) — the
    reference builds two independent generator/discriminator pairs
    (CycleGAN.py:235-239)."""
    return Generator(cfg), Generator(cfg), Discriminator(cfg), Discriminator(cfg)


def min_sharded_height(cfg: CycleGANConfig) -> int:
    """Smallest feature height of the stride-2 cascade that stays
    spatially sharded: the generator's two d_conv downsamples (H/4, where
    all 9 res blocks run). The PatchGAN's deeper VALID maps get tiny (6 rows
    at 128px) but were measured bit-exact under the 4x2 mesh at 96px in the
    f64 final-state tests (GSPMD re-replicates them); the measured-wrong
    regime is the strided halo cascade, which this bound tracks. Input to
    core/mesh.check_spatial_partition."""
    return cfg.image_size[0] // 4
