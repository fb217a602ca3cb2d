"""Evaluation math tests: Newton-Schulz sqrtm vs scipy, FID, PD."""

import jax.numpy as jnp
import numpy as np
import pytest

from imagegeneration_tpu.evalx.fid import calculate_fid_from_features
from imagegeneration_tpu.evalx.pd import (
    VGG16Features,
    load_vgg16_params,
    make_pd_fn,
    nearest_resize_224,
)
from imagegeneration_tpu.ops.sqrtm import sqrtm_newton_schulz, trace_sqrtm_product


def _random_psd(n, seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, 2 * n)).astype(np.float32)
    return (a @ a.T) / (2 * n)


def test_newton_schulz_matches_scipy_sqrtm():
    a = _random_psd(24, 0)
    s = np.asarray(sqrtm_newton_schulz(jnp.asarray(a)))
    np.testing.assert_allclose(s @ s, a, rtol=2e-3, atol=2e-4)


def test_trace_sqrtm_product_matches_scipy():
    a, b = _random_psd(16, 1), _random_psd(16, 2)
    t_ns = trace_sqrtm_product(a, b, "newton_schulz")
    t_sp = trace_sqrtm_product(a, b, "scipy")
    assert t_ns == pytest.approx(t_sp, rel=1e-3)


def test_fid_zero_for_identical_distributions():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(256, 8)).astype(np.float32)
    fid = calculate_fid_from_features(feats, feats.copy())
    assert abs(fid) < 1e-2


def test_fid_positive_and_orders_correctly():
    rng = np.random.default_rng(0)
    real = rng.normal(size=(256, 8)).astype(np.float32)
    close = real + 0.1 * rng.normal(size=real.shape).astype(np.float32)
    far = rng.normal(loc=3.0, size=real.shape).astype(np.float32)
    fid_close = calculate_fid_from_features(close, real)
    fid_far = calculate_fid_from_features(far, real)
    assert 0 < fid_close < fid_far


def test_fid_newton_schulz_vs_scipy_consistent():
    """NS works in the well-conditioned (samples >> dims) regime only."""
    rng = np.random.default_rng(3)
    fake = rng.normal(size=(128, 8)).astype(np.float32)
    real = rng.normal(loc=0.5, size=(128, 8)).astype(np.float32)
    f_ns = calculate_fid_from_features(fake, real, "newton_schulz")
    f_sp = calculate_fid_from_features(fake, real, "scipy")
    assert f_ns == pytest.approx(f_sp, rel=1e-3)


def test_fid_lowrank_matches_scipy_in_rank_deficient_regime():
    """The realistic disc-feature FID regime: samples << dims. The default
    lowrank method must agree with the reference's scipy sqrtm formulation."""
    rng = np.random.default_rng(4)
    for n, d in ((4, 512), (32, 512), (128, 64)):
        fake = rng.normal(size=(n, d)).astype(np.float32)
        real = rng.normal(loc=0.3, size=(n, d)).astype(np.float32)
        f_lr = calculate_fid_from_features(fake, real, "lowrank")
        f_sp = calculate_fid_from_features(fake, real, "scipy")
        assert f_lr == pytest.approx(f_sp, rel=5e-3)
        assert np.isfinite(f_lr)


def test_vgg_feature_shape():
    model = VGG16Features()
    import jax

    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    out = model.apply(variables, jnp.zeros((2, 224, 224, 3)))
    # 4 maxpools: 224 -> 14; block5_conv1 width 512
    assert out.shape == (2, 14, 14, 512)


def test_nearest_resize():
    x = jnp.asarray(np.arange(2 * 8 * 8 * 3).reshape(2, 8, 8, 3), jnp.float32)
    y = nearest_resize_224(x)
    assert y.shape == (2, 224, 224, 3)
    # nearest keeps exact source values
    assert float(y[0, 0, 0, 0]) == float(x[0, 0, 0, 0])


def test_pd_zero_for_identity_and_positive_otherwise():
    variables = load_vgg16_params(None)  # fixed random init
    pd_fn = make_pd_fn(variables)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    pds_same = np.asarray(pd_fn(a, a))
    np.testing.assert_allclose(pds_same, 0.0, atol=1e-8)
    b = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    assert np.all(np.asarray(pd_fn(a, b)) > 0)
