"""Unit tests for nn building blocks: shapes, Keras-semantics, quirks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagegeneration_tpu.nn.layers import (
    BatchNorm,
    Conv,
    ConvTranspose,
    InstanceNorm,
    ResBlock,
    reflection_pad_2d,
)
from imagegeneration_tpu.nn.spectral_norm import (
    SpectralNormConv,
    SpectralNormDense,
    power_iteration,
)


def test_conv_same_padding_shapes():
    x = jnp.zeros((2, 18, 32, 8))
    for k, s, exp in [((3, 3), (1, 1), (18, 32)), ((4, 4), (2, 2), (9, 16))]:
        m = Conv(16, k, s, "SAME")
        y, _ = jnp.zeros(0), None
        params = m.init(jax.random.key(0), x)
        y = m.apply(params, x)
        assert y.shape == (2, *exp, 16)


def test_conv_transpose_same_doubles_spatial():
    x = jnp.zeros((2, 9, 16, 8))
    m = ConvTranspose(4, (4, 4), (2, 2), "SAME")
    params = m.init(jax.random.key(0), x)
    assert m.apply(params, x).shape == (2, 18, 32, 4)


def test_batchnorm_train_vs_eval():
    x = jax.random.normal(jax.random.key(1), (8, 4, 4, 3)) * 3 + 1
    m = BatchNorm(use_running_average=False)
    variables = m.init(jax.random.key(0), x)
    y, mut = m.apply(variables, x, mutable=["batch_stats"])
    # train mode normalizes with batch stats -> near zero mean, unit var
    np.testing.assert_allclose(np.mean(y), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.var(np.asarray(y)), 1.0, atol=1e-2)
    # running stats moved toward batch stats with momentum .99
    means = [np.asarray(x) for x in jax.tree.leaves(mut["batch_stats"])]
    assert any(not np.allclose(m, 0.0) for m in means)


def test_instance_norm_default_per_channel():
    x = jax.random.normal(jax.random.key(1), (2, 6, 5, 3)) * 2 + 5
    m = InstanceNorm()
    variables = m.init(jax.random.key(0), x)
    # strip the affine to check pure normalization
    variables = jax.tree.map(lambda a: np.zeros_like(a), variables)
    y = m.apply(
        {"params": {"scale": jnp.ones(3), "bias": jnp.zeros(3)}}, x
    )
    y = np.asarray(y)
    # per (sample, channel) statistics over H, W
    assert abs(y[0, :, :, 0].mean()) < 1e-4
    assert abs(y[1, :, :, 2].mean()) < 1e-4
    assert abs(y[0, :, :, 1].std() - 1.0) < 1e-2


def test_instance_norm_quirk_axis1_param_shape():
    x = jnp.zeros((2, 6, 5, 3))
    m = InstanceNorm(quirk_axis1=True)
    variables = m.init(jax.random.key(0), x)
    assert variables["params"]["scale"].shape == (6, 1, 1)


def test_reflection_pad():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y = reflection_pad_2d(x, (1, 1))
    assert y.shape == (1, 6, 6, 1)
    # reflect: row -1 mirrors row 1
    np.testing.assert_array_equal(y[0, 0, 1:-1, 0], x[0, 1, :, 0])


def test_resblock_shape_preserved():
    x = jnp.zeros((1, 8, 8, 16))
    m = ResBlock(16)
    variables = m.init(jax.random.key(0), x)
    assert m.apply(variables, x).shape == x.shape


def test_power_iteration_estimates_sigma_max():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    u = u / np.linalg.norm(u)
    sigma = 0.0
    for _ in range(50):
        sigma, u = power_iteration(w, u)
    true_sigma = np.linalg.svd(np.asarray(w), compute_uv=False)[0]
    np.testing.assert_allclose(float(sigma), true_sigma, rtol=1e-3)


def test_spectral_norm_conv_bounds_sigma():
    """After normalization the kernel matrix has top singular value ~1."""
    x = jnp.zeros((1, 8, 8, 4))
    m = SpectralNormConv(8, (3, 3))
    variables = m.init(jax.random.key(0), x)
    kernel = variables["params"]["kernel"]
    u = variables["spectral"]["u"]
    # run a few forward passes to converge u
    for _ in range(20):
        _, mut = m.apply(variables, x, update_stats=True, mutable=["spectral"])
        variables = {"params": variables["params"], "spectral": mut["spectral"]}
    w = np.asarray(kernel).reshape(-1, 8)
    sigma_est = np.linalg.svd(w, compute_uv=False)[0]
    # the layer divides by a power-iteration estimate of sigma; the estimate
    # must be close to the truth once converged
    from imagegeneration_tpu.nn.spectral_norm import power_iteration as pi

    s, _ = pi(jnp.asarray(w), jnp.asarray(variables["spectral"]["u"]))
    np.testing.assert_allclose(float(s), sigma_est, rtol=1e-2)


def test_spectral_norm_dense_shapes():
    x = jnp.zeros((2, 32))
    m = SpectralNormDense(1)
    variables = m.init(jax.random.key(0), x)
    y = m.apply(variables, x, update_stats=False)
    assert y.shape == (2, 1)
