"""SNDCGAN generator / discriminator — TPU-native Flax rebuild.

Architecture parity targets (cited into /root/reference/):
- generator: sndcgan/SNDCGAN.py:25-66 — z(128) -> Dense(512*H/8*W/8, no bias)
  -> BN -> ReLU -> reshape(H/8, W/8, 512) -> 3x[ConvT 4x4 s2 SAME no-bias
  (256/128/64) -> BN -> ReLU] -> ConvT 3x3 s1 SAME no-bias 3ch -> tanh.
- discriminator: sndcgan/SNDCGAN.py:69-128 — 7 SAME convs
  (64@3x3s1, 128@4x4s2, 128@3x3s1, 256@4x4s2, 256@3x3s1, 512@4x4s2, 512@3x3s1),
  each followed by LeakyReLU(0.1) + Dropout(rate), then Flatten + Dense(1).

Deltas from the reference (deliberate, documented):
- `spectral_norm=True` wraps every discriminator conv + the output Dense in
  spectral normalization with fused power iteration (the reference *names*
  SN-GAN but ships a plain conv stack; the BASELINE north star requires real
  SN). Default False preserves reference behavior.
- The reference accidentally runs the generator's BatchNorm in inference mode
  during training (SNDCGAN.py:243 calls `gen_model(input_z)` without
  `training=True`, so Keras BN uses its (never-updated) moving statistics).
  We default to the *corrected* behavior (train-mode BN); pass
  `quirk_eval_bn=True` to the generator to reproduce the reference exactly.
- Compute dtype is configurable (bfloat16 on the TPU hot path); parameters and
  normalization statistics stay float32.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

from imagegeneration_tpu.nn.layers import (
    BatchNorm,
    Conv,
    ConvTranspose,
    Dense,
)
from imagegeneration_tpu.ops.bitdropout import BitDropout
from imagegeneration_tpu.nn.spectral_norm import SpectralNormConv, SpectralNormDense

Dtype = Any


@dataclasses.dataclass(frozen=True)
class SNDCGANConfig:
    """Static model config (reference defaults: sndcgan/Trainer.py:5-8,22-27)."""

    image_size: tuple[int, int, int] = (144, 256, 3)  # (H, W, C)
    z_size: int = 128
    dropout_rate: float = 0.5
    base_width: int = 512  # generator stem channels / top disc channels
    spectral_norm: bool = False
    quirk_eval_bn: bool = False  # reproduce reference's inference-mode gen BN
    # Bit-packed dropout masks (ops/bitdropout): 1 random bit per element at
    # rate 0.5 instead of 32 — profiling showed full-width mask generation
    # was 27% of the fused train step. Same iid Bernoulli semantics,
    # different (still deterministic) mask values per key.
    dropout_bits: bool = True
    # Counter-hash mask generation (ops/bitdropout.hash_dropout): the mask
    # is computed inline in the consumer's layout, removing the ~0.95 ms/ea
    # relayout copies the rbg u8 masks cost at headline shapes (measured,
    # benchmarks/trace_breakdown.py). Statistically validated in
    # tests/test_bitdropout.py; set False to restore the rng-buffer path.
    dropout_hash: bool = True
    # Murmur3-finalizer rounds for the counter-hash masks: 1 halves the
    # per-element VPU work (fmix32 is a full-avalanche finalizer on its
    # own; the mask hash runs fwd + recomputed bwd over ~624M elements per
    # headline step). Both settings pass the same statistical quality
    # gates (tests/test_bitdropout.py).
    dropout_hash_rounds: int = 1
    dtype: Any = jnp.float32

    def __post_init__(self) -> None:
        # Only two mask streams exist (each with its own pinned golden,
        # tests/test_goldens.py); anything else must fail at build time
        # instead of silently mapping to the 2-round mode (ADVICE r3).
        if self.dropout_hash_rounds not in (1, 2):
            raise ValueError(
                f"dropout_hash_rounds must be 1 or 2, got "
                f"{self.dropout_hash_rounds!r}"
            )


class Generator(fnn.Module):
    """DCGAN generator: z -> (H, W, 3) in [-1, 1]."""

    cfg: SNDCGANConfig

    @fnn.compact
    def __call__(self, z: jax.Array, train: bool = True) -> jax.Array:
        cfg = self.cfg
        h, w, c = cfg.image_size
        h8, w8 = h // 8, w // 8
        base = cfg.base_width
        dt = cfg.dtype
        # When quirk_eval_bn is set, BN always uses running averages (which the
        # reference never updates), matching Keras training=False semantics.
        bn_inference = (not train) or cfg.quirk_eval_bn

        x = Dense(base * h8 * w8, use_bias=False, dtype=dt, name="stem")(
            z.astype(dt)
        )
        x = BatchNorm(use_running_average=bn_inference, dtype=dt, name="stem_bn")(x)
        x = jax.nn.relu(x)
        x = x.reshape(x.shape[0], h8, w8, base)

        for i, feats in enumerate((base // 2, base // 4, base // 8)):
            x = ConvTranspose(
                feats, (4, 4), (2, 2), "SAME", use_bias=False,
                dtype=dt, name=f"up{i}",
            )(x)
            x = BatchNorm(
                use_running_average=bn_inference, dtype=dt, name=f"up{i}_bn"
            )(x)
            x = jax.nn.relu(x)

        x = ConvTranspose(
            c, (3, 3), (1, 1), "SAME", use_bias=False, dtype=dt, name="to_rgb"
        )(x)
        return jnp.tanh(x.astype(jnp.float32))


# (filters, kernel, stride) for the 7-conv discriminator trunk,
# mirroring sndcgan/SNDCGAN.py:73-120.
_DISC_TRUNK = (
    (64, (3, 3), (1, 1)),
    (128, (4, 4), (2, 2)),
    (128, (3, 3), (1, 1)),
    (256, (4, 4), (2, 2)),
    (256, (3, 3), (1, 1)),
    (512, (4, 4), (2, 2)),
    (512, (3, 3), (1, 1)),
)


class Discriminator(fnn.Module):
    """Conv logit critic; returns (B, 1) logits.

    `features=True` returns the pre-head activations after 8x8 average pooling
    + flatten — the feature extractor used by the reference's FID evaluation
    (sndcgan/generator_evaluation.py:134-138 pops the Flatten/Dense head and
    appends AvgPool(8,8)+Flatten).
    """

    cfg: SNDCGANConfig

    @fnn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = True,
        update_sn: bool = True,
        features: bool = False,
    ) -> jax.Array:
        cfg = self.cfg
        dt = cfg.dtype
        x = x.astype(dt)
        for i, (feats, ksize, stride) in enumerate(_DISC_TRUNK):
            if cfg.spectral_norm:
                x = SpectralNormConv(
                    feats, ksize, stride, "SAME", dtype=dt, name=f"conv{i}"
                )(x, update_stats=update_sn)
            else:
                x = Conv(feats, ksize, stride, "SAME", dtype=dt, name=f"conv{i}")(x)
            x = jax.nn.leaky_relu(x, negative_slope=0.1)
            if cfg.dropout_bits:
                x = BitDropout(
                    rate=cfg.dropout_rate,
                    mode=(
                        ("hash1" if cfg.dropout_hash_rounds == 1 else "hash")
                        if cfg.dropout_hash
                        else "bits"
                    ),
                )(x, deterministic=not train)
            else:
                x = fnn.Dropout(rate=cfg.dropout_rate, deterministic=not train)(x)

        if features:
            # AvgPool(8x8, stride 8, VALID) + flatten, as in the reference's
            # FID feature extractor.
            if min(x.shape[1], x.shape[2]) < 8:
                raise ValueError(
                    f"FID feature extractor needs a trunk >= 8x8 after the "
                    f"three stride-2 convs (got {x.shape[1]}x{x.shape[2]}); "
                    f"use images >= 64px per side (reference: 144x256)."
                )
            x = fnn.avg_pool(x, (8, 8), strides=(8, 8), padding="VALID")
            return x.reshape(x.shape[0], -1).astype(jnp.float32)

        x = x.reshape(x.shape[0], -1)
        if cfg.spectral_norm:
            logits = SpectralNormDense(1, dtype=dt, name="head")(
                x, update_stats=update_sn
            )
        else:
            logits = Dense(1, dtype=dt, name="head")(x)
        return logits.astype(jnp.float32)


def make_models(cfg: SNDCGANConfig) -> tuple[Generator, Discriminator]:
    return Generator(cfg), Discriminator(cfg)


def min_sharded_height(cfg: SNDCGANConfig) -> int:
    """Smallest spatially-sharded feature height: the discriminator's three
    4x4 s2 convs (and the generator's H/8 stem start) bottom out at H/8.
    Input to core/mesh.check_spatial_partition (degenerate-GSPMD guard)."""
    return cfg.image_size[0] // 8
