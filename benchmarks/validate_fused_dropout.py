"""On-device validation + microbench for the fused leaky-relu+dropout kernel.

Run on real TPU (the CPU interpret mode stubs prng_random_bits to zeros, so
tests/test_pallas_dropout.py's semantics tests skip off-TPU and this script
is the hardware check). Exercises: keep-fraction, kept-value exactness,
determinism/seed sensitivity, backward mask regeneration — then times the
fused op against the XLA leaky-relu+dropout chain at a discriminator shape.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from imagegeneration_tpu.ops.pallas.dropout import leaky_relu_dropout

RATE, ALPHA = 0.5, 0.1


def main() -> None:
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 2, (16, 8, 8, 128)).astype(np.float32)
    )
    f = jax.jit(lambda x, s: leaky_relu_dropout(x, s, RATE, ALPHA))
    y = np.asarray(f(x, jnp.int32(7)))
    lr = np.asarray(jax.nn.leaky_relu(x, ALPHA))
    kept = y != 0.0
    np.testing.assert_allclose(y[kept], lr[kept] / (1 - RATE), rtol=1e-6)
    assert abs(kept.mean() - (1 - RATE)) < 0.02, kept.mean()
    y2 = np.asarray(f(x, jnp.int32(7)))
    y3 = np.asarray(f(x, jnp.int32(8)))
    np.testing.assert_array_equal(y, y2)
    assert not np.array_equal(y, y3)

    g_fn = jax.jit(jax.grad(
        lambda x_, s: jnp.sum(leaky_relu_dropout(x_, s, RATE, ALPHA) ** 2)
    ))
    g = np.asarray(g_fn(x, jnp.int32(7)))
    np.testing.assert_array_equal(g == 0.0, y == 0.0)
    kept_pos = (y != 0) & (np.asarray(x) > 0)
    np.testing.assert_allclose(g[kept_pos], 2 * y[kept_pos] / (1 - RATE), rtol=1e-5)
    print("semantics OK: keep", round(float(kept.mean()), 4))

    # microbench at a D shape (relative comparison, same-size programs)
    shape = (32, 72, 128, 128)
    xb = jnp.asarray(np.random.default_rng(1).normal(size=shape).astype(np.float32))
    key = jax.random.key(0, impl="rbg")

    def xla_chain(x, key):
        keep = jax.random.bernoulli(key, 1 - RATE, x.shape)
        return jnp.where(keep, jax.nn.leaky_relu(x, ALPHA) / (1 - RATE), 0.0)

    f_xla = jax.jit(xla_chain)
    f_pal = jax.jit(lambda x, s: leaky_relu_dropout(x, s, RATE, ALPHA))

    def bench(fn, *args, iters=30):
        y = fn(*args); jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        jax.block_until_ready(y)
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"xla rbg chain: {bench(f_xla, xb, key):.3f} ms  "
          f"pallas fused: {bench(f_pal, xb, jnp.int32(1)):.3f} ms")


if __name__ == "__main__":
    main()
