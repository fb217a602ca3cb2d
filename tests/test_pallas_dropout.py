"""Fused leaky-relu+dropout kernel tests.

The mask-semantics tests require real TPU hardware: the Pallas TPU interpret
mode stubs `prng_random_bits` to zeros on CPU, so they are skipped here and
exercised by benchmarks/validate_fused_dropout.py on-device (run during
round 1; see benchmarks/README.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagegeneration_tpu.ops.pallas.dropout import (
    _pick_rows,
    leaky_relu_dropout,
    seed_from_key,
    supported,
)

RATE, ALPHA = 0.5, 0.1

on_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="pltpu.prng_random_bits is a zero-stub in CPU interpret mode",
)


def _x(shape=(16, 8, 8, 128), seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(0, 2, shape).astype(np.float32)
    )


def test_pick_rows():
    assert _pick_rows(1024, 128) is not None
    assert _pick_rows(1024, 128) % 8 == 0
    assert supported((32, 144, 256, 64))
    assert not supported((7, 128))  # rows not a multiple of 8


@on_tpu
def test_forward_semantics():
    x = _x()
    y = np.asarray(leaky_relu_dropout(x, jnp.int32(7), RATE, ALPHA, False))
    lr = np.asarray(jax.nn.leaky_relu(x, ALPHA))
    kept = y != 0.0
    # kept entries are exactly leaky_relu(x)/(1-rate) (zero-x entries aside)
    np.testing.assert_allclose(y[kept], lr[kept] / (1 - RATE), rtol=1e-6)
    # keep fraction ~ 1-rate
    assert abs(kept.mean() - (1 - RATE)) < 0.02
    # negative inputs flow through with the leaky slope when kept
    neg = (np.asarray(x) < 0) & kept
    assert neg.any()
    assert (y[neg] < 0).all()


@on_tpu
def test_deterministic_and_seed_sensitivity():
    x = _x()
    y1 = np.asarray(leaky_relu_dropout(x, jnp.int32(7), RATE, ALPHA, False))
    y2 = np.asarray(leaky_relu_dropout(x, jnp.int32(7), RATE, ALPHA, False))
    y3 = np.asarray(leaky_relu_dropout(x, jnp.int32(8), RATE, ALPHA, False))
    np.testing.assert_array_equal(y1, y2)
    assert not np.array_equal(y1, y3)


@on_tpu
def test_backward_regenerates_same_mask():
    x = _x(shape=(8, 8, 128), seed=1)

    def loss(x_):
        return jnp.sum(leaky_relu_dropout(x_, jnp.int32(3), RATE, ALPHA, False) ** 2)

    g = np.asarray(jax.grad(loss)(x))
    y = np.asarray(leaky_relu_dropout(x, jnp.int32(3), RATE, ALPHA, False))
    # gradient must vanish exactly where the forward dropped
    np.testing.assert_array_equal(g == 0.0, y == 0.0)
    # kept positive entries: d/dx sum(y^2) = 2*y/(1-rate)
    kept_pos = (y != 0) & (np.asarray(x) > 0)
    np.testing.assert_allclose(
        g[kept_pos], 2 * y[kept_pos] / (1 - RATE), rtol=1e-5
    )
    # kept negative entries include the leaky slope
    kept_neg = (y != 0) & (np.asarray(x) < 0)
    np.testing.assert_allclose(
        g[kept_neg], 2 * y[kept_neg] * ALPHA / (1 - RATE), rtol=1e-5
    )


def test_seed_from_key_stable():
    key = jax.random.key(62)
    s1 = int(seed_from_key(key, 0))
    s2 = int(seed_from_key(key, 0))
    s3 = int(seed_from_key(key, 1))
    assert s1 == s2 and s1 != s3
