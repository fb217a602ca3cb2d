"""imagegeneration_tpu — a TPU-native JAX framework for GAN image generation.

A from-scratch rebuild of the capabilities of jonathan-schilling/imageGeneration
(three GAN families: SNDCGAN landscape synthesis, WGAN with weight clipping,
CycleGAN unpaired translation; plus data pipeline, checkpoint/resume, sampling,
FID / perception-distance evaluation and dataset construction tooling) designed
TPU-first:

- every train step is ONE fused, jitted XLA program (generator + discriminator
  forward/backward/update + metrics) with donated state buffers,
- data parallelism and spatial (H-axis) partitioning ride `jax.sharding.Mesh`
  + NamedSharding annotations, with XLA inserting ICI collectives,
- hot elementwise/normalization paths have Pallas TPU kernels with pure-XLA
  fallbacks,
- checkpoints are Orbax, PRNG is explicit threefry key streams.

Package layout:
  core/      mesh, data pipeline, PRNG contract, checkpointing, metrics, trainer
  nn/        Keras-semantics-matching Flax building blocks (BN eps, inits, ...)
  ops/       math ops incl. Pallas TPU kernels + XLA fallbacks
  models/    SNDCGAN, WGAN, CycleGAN architectures
  train/     fused train steps + per-model engines
  parallel/  device-mesh DP/spatial sharding helpers
  evalx/     FID and VGG perception-distance evaluation
  cli/       reference-signature-compatible entry points
  datasets/  dataset construction tooling (downloaders, label QA, annotation)
"""

__version__ = "0.1.0"
