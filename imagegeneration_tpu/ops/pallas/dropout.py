"""Fused LeakyReLU + inverted dropout as a Pallas TPU kernel.

The SNDCGAN discriminator applies conv -> LeakyReLU(0.1) -> Dropout(rate)
seven times, and the fused train step runs the discriminator three times —
21 dropout sites per step (sndcgan/SNDCGAN.py:69-128, :241-269). Even with
the rbg stream, XLA materializes a keep-mask per site between forward and
backward. This kernel:

- draws the mask bits with the in-kernel hardware PRNG (pltpu.prng_random_bits)
  seeded per (site seed, grid block) — no mask tensor in HBM;
- fuses leaky-relu, threshold, scale into one VMEM pass;
- regenerates the SAME bits in the backward pass (same seed, same block
  mapping), so the VJP's only residual is `x` itself.

Deterministic per (seed, shape) on TPU; semantics validated on hardware
(benchmarks/validate_fused_dropout.py: exact kept values, keep fraction,
determinism, backward mask regeneration). Measured on v5e, however, XLA's
own rbg-keyed dropout chain is already slightly FASTER than this kernel at
discriminator shapes (1.90 vs 2.22 ms fwd at 32x72x128x128) — the rbg
stream switch in train/sndcgan_step captured the dropout win, so this
kernel is kept as a validated primitive and is NOT wired into the models.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_TARGET_BYTES = 2 * 1024 * 1024


def _pick_rows(m: int, c: int) -> int | None:
    """Largest row block (multiple of 8, dividing m) fitting VMEM; the lane
    dim c is padded to 128 by the hardware."""
    padded_c = -(-c // 128) * 128
    limit = max(8, _VMEM_TARGET_BYTES // (padded_c * 4))
    bm = min(m, limit)
    bm -= bm % 8
    while bm >= 8:
        if m % bm == 0:
            return bm
        bm -= 8
    return None


def _kernel(x_ref, seed_ref, o_ref, *, rate: float, alpha: float):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(x_ref.shape)
    threshold = jnp.uint32(min(int((1.0 - rate) * 2**32), 2**32 - 1))
    keep = pltpu.bitcast(bits, jnp.uint32) < threshold
    x = x_ref[...].astype(jnp.float32)
    y = jnp.where(x >= 0, x, alpha * x)  # leaky relu
    scale = 1.0 / (1.0 - rate)
    o_ref[...] = jnp.where(keep, y * scale, 0.0).astype(o_ref.dtype)


def _bwd_kernel(x_ref, seed_ref, g_ref, o_ref, *, rate: float, alpha: float):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(x_ref.shape)
    threshold = jnp.uint32(min(int((1.0 - rate) * 2**32), 2**32 - 1))
    keep = pltpu.bitcast(bits, jnp.uint32) < threshold
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    scale = 1.0 / (1.0 - rate)
    slope = jnp.where(x >= 0, 1.0, alpha)
    o_ref[...] = jnp.where(keep, g * scale * slope, 0.0).astype(o_ref.dtype)


def _call(kernel, rate, alpha, x2, seed, extra=None, interpret=False):
    m, c = x2.shape
    bm = _pick_rows(m, c)
    assert bm is not None
    grid = (m // bm,)
    seed_arr = jnp.asarray([seed], jnp.int32).reshape(1)
    in_specs = [
        pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    args = [x2, seed_arr]
    if extra is not None:
        in_specs.append(
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        args.append(extra)
    return pl.pallas_call(
        functools.partial(kernel, rate=rate, alpha=alpha),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        interpret=interpret,
    )(*args)


def _xla_reference(x, seed, rate, alpha):
    """Same math via jax.random (different bits; used for semantics tests)."""
    key = jax.random.key(seed, impl="rbg")
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    y = jax.nn.leaky_relu(x.astype(jnp.float32), alpha)
    return jnp.where(keep, y / (1.0 - rate), 0.0).astype(x.dtype)


def supported(x_shape: tuple[int, ...]) -> bool:
    c = x_shape[-1]
    m = 1
    for d in x_shape[:-1]:
        m *= d
    return _pick_rows(m, c) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def leaky_relu_dropout(
    x: jax.Array,
    seed: jax.Array,
    rate: float,
    alpha: float = 0.1,
    interpret: bool = False,
) -> jax.Array:
    """dropout(leaky_relu(x)) with the mask drawn in-kernel; seed is an int32
    scalar (derive it from a PRNG key outside)."""
    return _fwd(x, seed, rate, alpha, interpret)


def _fwd(x, seed, rate, alpha, interpret):
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    out = _call(_kernel, rate, alpha, x2, seed, interpret=interpret)
    return out.reshape(shape)


def _fwd_rule(x, seed, rate, alpha, interpret):
    return _fwd(x, seed, rate, alpha, interpret), (x, seed)


def _bwd_rule(rate, alpha, interpret, res, g):
    x, seed = res
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    g2 = g.reshape(-1, shape[-1]).astype(x.dtype)
    dx = _call(_bwd_kernel, rate, alpha, x2, seed, extra=g2,
               interpret=interpret)
    return dx.reshape(shape), None


leaky_relu_dropout.defvjp(_fwd_rule, _bwd_rule)


def seed_from_key(key: jax.Array, site: int) -> jax.Array:
    """Fold a jax PRNG key + dropout-site id into an int32 kernel seed."""
    data = jax.random.key_data(jax.random.fold_in(key, site))
    return data.ravel()[-1].astype(jnp.int32)
