"""Neural-net building blocks with TF/Keras-matching semantics where it counts.

The reference models are built from stock Keras layers; for FID-level parity
the defaults that influence numerics (initializers, BatchNorm epsilon/momentum,
LeakyReLU slopes, SAME padding) are matched here. Everything is Flax Linen,
NHWC, with a configurable compute dtype (bfloat16 on the TPU hot path).
"""

from imagegeneration_tpu.nn.layers import (
    Conv,
    ConvTranspose,
    Dense,
    BatchNorm,
    InstanceNorm,
    Dropout,
    ResBlock,
    reflection_pad_2d,
    leaky_relu,
    KERAS_GLOROT_UNIFORM,
    KERAS_RANDOM_NORMAL_002,
    KERAS_RANDOM_UNIFORM,
)
from imagegeneration_tpu.nn.spectral_norm import SpectralNormConv

__all__ = [
    "Conv",
    "ConvTranspose",
    "Dense",
    "BatchNorm",
    "InstanceNorm",
    "Dropout",
    "ResBlock",
    "reflection_pad_2d",
    "leaky_relu",
    "SpectralNormConv",
    "KERAS_GLOROT_UNIFORM",
    "KERAS_RANDOM_NORMAL_002",
    "KERAS_RANDOM_UNIFORM",
]
