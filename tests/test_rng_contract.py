"""PRNG contract tests: named streams, bitwise stability, independence."""

import jax
import numpy as np
import pytest

from imagegeneration_tpu.core.rng import KeyChain, normal_z, uniform_z


def test_streams_are_stable_across_instances():
    a, b = KeyChain(62), KeyChain(62)
    for name in ("params", "z", "dropout", "preview", "eval"):
        np.testing.assert_array_equal(
            jax.random.key_data(a.stream(name)),
            jax.random.key_data(b.stream(name)),
        )


def test_streams_are_independent():
    c = KeyChain(62)
    keys = {
        name: tuple(np.asarray(jax.random.key_data(c.stream(name))).tolist())
        for name in ("params", "z", "dropout", "preview", "eval")
    }
    assert len(set(keys.values())) == len(keys)


def test_different_seeds_differ():
    z1 = uniform_z(KeyChain(62).stream("z"), 4, 8)
    z2 = uniform_z(KeyChain(63).stream("z"), 4, 8)
    assert not np.allclose(np.asarray(z1), np.asarray(z2))


def test_at_step_folding():
    c = KeyChain(62)
    z0 = np.asarray(uniform_z(c.at_step("z", 0), 2, 4))
    z0b = np.asarray(uniform_z(c.at_step("z", 0), 2, 4))
    z1 = np.asarray(uniform_z(c.at_step("z", 1), 2, 4))
    np.testing.assert_array_equal(z0, z0b)
    assert not np.array_equal(z0, z1)


def test_latent_distributions():
    z_u = np.asarray(uniform_z(KeyChain(0).stream("z"), 4096, 8))
    assert z_u.min() >= -1.0 and z_u.max() < 1.0
    assert abs(z_u.mean()) < 0.02
    z_n = np.asarray(normal_z(KeyChain(0).stream("z"), 4096, 8))
    assert abs(z_n.mean()) < 0.03 and abs(z_n.std() - 1.0) < 0.03


def test_numpy_rng_reproducible():
    p1 = KeyChain(123).numpy_rng("data", 5).permutation(100)
    p2 = KeyChain(123).numpy_rng("data", 5).permutation(100)
    p3 = KeyChain(123).numpy_rng("data", 6).permutation(100)
    np.testing.assert_array_equal(p1, p2)
    assert not np.array_equal(p1, p3)
