"""PRNG contract for the framework.

The reference seeds three generators: `tf.random.set_seed(62)`,
`np.random.seed(87)` (sndcgan/SNDCGAN.py:21-22) and dataset seed 123
(sndcgan/SNDCGAN.py:136, wasserstein_gan/Trainer.py:20,
cyclegan/data_loader.py:15). Bitwise parity with TF's Philox generator is
impossible by construction, so the contract here is the one SURVEY.md §7
defines: *bitwise-stable within this framework* for fixed seeds — every random
draw comes from a named threefry stream derived from the workload seed, so the
same (seed, purpose, step) triple always produces the same bits on every
backend and device count.

Streams:
  params    — model initialization
  z         — latent draws (one fold per step index)
  dropout   — discriminator dropout masks (one fold per step index)
  data      — dataset shuffling (host-side; numpy Generator seeded from it)
  preview   — fixed preview-z draws
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

# Reference seeds, kept as the framework defaults.
DEFAULT_MODEL_SEED = 62
DEFAULT_NUMPY_SEED = 87
DEFAULT_DATA_SEED = 123

_STREAMS = ("params", "z", "dropout", "data", "preview", "eval")


@dataclasses.dataclass(frozen=True)
class KeyChain:
    """Named, per-step-foldable PRNG streams derived from one workload seed."""

    seed: int = DEFAULT_MODEL_SEED

    def base(self, impl: str | None = None) -> jax.Array:
        return jax.random.key(self.seed, impl=impl)

    def stream(self, name: str, impl: str | None = None) -> jax.Array:
        """Named stream key. `impl` selects the generator: None = threefry
        (the default contract), "rbg" = the XLA RngBitGenerator — on TPU it
        rides the on-chip hardware RNG and is ~10x cheaper to sample from,
        which matters for dropout masks over large activations (measured:
        56% of the SNDCGAN train step was threefry mask generation). rbg is
        still deterministic per (seed, stream, step) on a given backend; its
        bits differ from threefry's, so streams that feed *artifacts* (z,
        preview, eval) stay threefry by default."""
        if name not in _STREAMS:
            raise ValueError(f"unknown stream {name!r}; known: {_STREAMS}")
        return jax.random.fold_in(self.base(impl), _STREAMS.index(name) + 1)

    def at_step(self, name: str, step: int | jax.Array) -> jax.Array:
        return jax.random.fold_in(self.stream(name), step)

    def numpy_rng(self, name: str = "data", epoch: int = 0) -> np.random.Generator:
        """Host-side generator for dataset shuffling (stable across runs)."""
        return np.random.default_rng(
            np.asarray(
                jax.random.key_data(self.at_step(name, epoch)), dtype=np.uint32
            )
        )


def uniform_z(key: jax.Array, batch: int, z_size: int) -> jax.Array:
    """SNDCGAN latent: U[-1, 1) (sndcgan/SNDCGAN.py:283)."""
    return jax.random.uniform(key, (batch, z_size), minval=-1.0, maxval=1.0)


def normal_z(key: jax.Array, batch: int, z_size: int) -> jax.Array:
    """WGAN latent: standard normal (wasserstein_gan/WGAN.py:212-217)."""
    return jax.random.normal(key, (batch, z_size))
