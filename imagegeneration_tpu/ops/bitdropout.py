"""Bit-packed dropout: one random BIT per element instead of 32.

Profiling the headline SNDCGAN step (benchmarks/profile_step.py) showed the
21 dropout sites (7 discriminator layers x 3 D invocations per fused step)
cost 14.6 ms of the 54.8 ms step — 27% — even with the on-chip rbg
generator, because jax.random draws a full uint32 per mask element before
the >= threshold compare. A rate-0.5 Bernoulli needs ONE bit per element:
draw N/32 uint32s and fan each out to 32 mask bits with a shift-and-mask —
32x fewer RNG outputs and pure VPU elementwise ops that XLA fuses into the
surrounding multiply.

For rates other than 1/2 a byte-threshold variant draws N/4 uint32s (4
bytes per word, rate quantized to 1/256 steps; the inverted-dropout scale
uses the EXACT quantized keep probability so the estimator stays unbiased).
The reference's dropout is 0.5 (sndcgan/Trainer.py:22), which both paths
represent exactly.

Parity note: masks are iid Bernoulli as required, but the mask VALUES for a
given key differ from flax.linen.Dropout's — dropout draws are never
parity-relevant (stochastic regularization), and the PRNG contract
(bitwise-stable for a fixed seed within this framework) is preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as fnn


from functools import partial


def _apply_mask(key: jax.Array, x: jax.Array, cut: int, keep_prob: float):
    keep = jax.random.bits(key, x.shape, jnp.uint8) >= jnp.uint8(cut)
    scale = jnp.asarray(1.0 / keep_prob, x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bit_dropout_vjp(key: jax.Array, x: jax.Array, rate: float) -> jax.Array:
    cut = round(rate * 256.0)
    return _apply_mask(key, x, cut, (256 - cut) / 256.0)


def _bd_fwd(key, x, rate):
    cut = round(rate * 256.0)
    # Residual is ONLY the key: the backward pass REGENERATES the mask from
    # it (rng is deterministic) instead of saving a feature-map-sized mask.
    # Profiling showed saved masks cost ~3 ms/step in layout copies alone,
    # plus their HBM write+read traffic.
    return _apply_mask(key, x, cut, (256 - cut) / 256.0), key


def _bd_bwd(rate, key, g):
    cut = round(rate * 256.0)
    return (None, _apply_mask(key, g, cut, (256 - cut) / 256.0))


_bit_dropout_vjp.defvjp(_bd_fwd, _bd_bwd)


def _fmix32(h: jax.Array) -> jax.Array:
    """MurmurHash3 32-bit finalizer — full avalanche on u32 (public domain
    constants). Pure VPU elementwise ops; fuses into any consumer."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _linear_index_u32(shape: tuple[int, ...]) -> jax.Array:
    """Global element index as u32, built from per-dim iotas (XLA generates
    iota directly in the consumer's layout — no materialized buffer)."""
    total = None
    stride = 1
    for d in reversed(range(len(shape))):
        part = jax.lax.broadcasted_iota(jnp.uint32, shape, d)
        if stride != 1:
            part = part * jnp.uint32(stride)
        total = part if total is None else total + part
        stride *= shape[d]
    return total


def _hash_mask(
    kw: jax.Array, x: jax.Array, cut: int, keep_prob: float, rounds: int = 2
):
    """Counter-based mask, keep when the hash's low byte clears the
    threshold. Unlike an rng-bit-generator draw this has NO layout of its
    own — the whole mask computation happens elementwise in the consumer's
    layout and fuses into the multiply, eliminating the
    full-activation-sized relayout copies the u8 rbg masks cost (~0.95 ms
    EACH for the three 32x144x256x64 masks per headline step; measured in
    benchmarks/trace_breakdown.py).

    rounds=2: h = fmix32(fmix32(idx ^ k0) ^ k1) (extra-conservative).
    rounds=1: h = fmix32(idx ^ k0) + k1 — fmix32 IS murmur3's full-avalanche
    finalizer on its own (every output bit depends on every input bit; the
    double application was belt-and-braces); the second key word only
    rotates the threshold byte after avalanche. Halves the per-element VPU
    work: mask compute runs in fwd AND (recomputed, custom VJP) bwd over
    ~624M mask elements per headline step, so the hash is a measurable
    device-time line item. Quality gates in tests/test_bitdropout.py (keep
    rate, neighbor/key decorrelation) cover both."""
    h = _fmix32(_linear_index_u32(x.shape) ^ kw[0])
    h = _fmix32(h ^ kw[1]) if rounds == 2 else h + kw[1]
    keep = (h & jnp.uint32(0xFF)) >= jnp.uint32(cut)
    scale = jnp.asarray(1.0 / keep_prob, x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _hash_dropout_vjp(
    kw: jax.Array, x: jax.Array, rate: float, rounds: int
) -> jax.Array:
    cut = round(rate * 256.0)
    return _hash_mask(kw, x, cut, (256 - cut) / 256.0, rounds)


def _hd_fwd(kw, x, rate, rounds):
    cut = round(rate * 256.0)
    # Residual is only the two key words; the backward recomputes the mask.
    return _hash_mask(kw, x, cut, (256 - cut) / 256.0, rounds), kw


def _hd_bwd(rate, rounds, kw, g):
    cut = round(rate * 256.0)
    return (None, _hash_mask(kw, g, cut, (256 - cut) / 256.0, rounds))


_hash_dropout_vjp.defvjp(_hd_fwd, _hd_bwd)


def hash_dropout(
    key: jax.Array, x: jax.Array, rate: float, rounds: int = 2
) -> jax.Array:
    """Inverted dropout with counter-based (stateless-hash) masks.

    Same iid-Bernoulli semantics and rate quantization as bit_dropout, but
    the mask is a pure function of (key, element index) computed inline:
    murmur3-finalizer round(s) over the element's linear index mixed with
    two key-derived words (see _hash_mask for the rounds trade-off).
    Avalanche quality is statistically validated in tests/test_bitdropout.py
    (mean, per-axis neighbor correlation, key decorrelation). The only
    memory the mask ever touches is the fused consumer's — no rng buffer,
    no relayout copy, and the backward pass recomputes instead of storing
    (custom VJP)."""
    if rate <= 0.0 or round(rate * 256.0) <= 0:
        return x
    if round(rate * 256.0) >= 256:
        return jnp.zeros_like(x)
    kw = jax.random.bits(key, (2,), jnp.uint32)  # scalar-sized draw
    return _hash_dropout_vjp(kw, x, rate, rounds)


def bit_dropout(key: jax.Array, x: jax.Array, rate: float) -> jax.Array:
    """Inverted dropout from uint8 random bytes (train mode).

    One byte per element instead of the 32 bits jax.random.bernoulli's
    uniform-compare path consumes, with no reshape/relayout (an earlier
    1-bit-per-element variant packed 32 masks per word but the (n,32)->N
    fan-out forced a lane relayout that cost more than it saved — measured
    72 ms vs 54 ms full-step). Rate is quantized to 1/256 steps and the
    inverted-dropout scale uses the EXACT quantized keep probability, so
    the estimator stays unbiased; 0.5 (the reference's rate) is exact.

    The mask is never stored: a custom VJP regenerates it from the key in
    the backward pass (the same deterministic bits), so no feature-map-sized
    residual crosses the forward/backward boundary."""
    if rate <= 0.0 or round(rate * 256.0) <= 0:
        return x
    if round(rate * 256.0) >= 256:  # rate ~ 1.0: nothing survives
        return jnp.zeros_like(x)
    return _bit_dropout_vjp(key, x, rate)


class BitDropout(fnn.Module):
    """Drop-in replacement for flax.linen.Dropout using byte-threshold
    ("bits") or counter-hash ("hash") masks.

    Uses the same "dropout" RNG collection (flax folds the module path into
    make_rng, so every instance draws an independent stream)."""

    rate: float
    # "bits" (u8 rng draw) | "hash" (2-round counter hash) | "hash1"
    # (1-round counter hash — half the VPU work, same quality gates)
    mode: str = "bits"

    @fnn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if deterministic or self.rate <= 0.0:
            return x
        key = self.make_rng("dropout")
        if self.mode == "hash":
            return hash_dropout(key, x, self.rate, rounds=2)
        if self.mode == "hash1":
            return hash_dropout(key, x, self.rate, rounds=1)
        return bit_dropout(key, x, self.rate)
