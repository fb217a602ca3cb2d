"""Pallas kernel tests (interpret mode on CPU) vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from imagegeneration_tpu.ops.pallas.instance_norm import (
    _in_fwd_pallas,
    _in_fwd_xla,
    _pick_c_block,
    instance_norm,
)


def _inputs(b=2, h=8, w=8, c=16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(2.0, 3.0, (b, h, w, c)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(1.0, 0.1, (c,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0.0, 0.1, (c,)).astype(np.float32))
    return x, gamma, beta


def test_pick_c_block():
    # 128x128x256: no Mosaic-legal block fits VMEM -> XLA fallback
    assert _pick_c_block(128, 128, 256) is None
    assert _pick_c_block(8, 8, 128) == 128
    assert _pick_c_block(32, 32, 256) == 256  # res-block interior: full C fits
    assert _pick_c_block(64, 64, 128) == 128  # down/up conv layers
    # lane padding: a C=3 block really occupies 128 lanes -> 8MB at 128px,
    # must fall back (this OOM'd the CycleGAN to_rgb_in on real hardware)
    assert _pick_c_block(128, 128, 3) is None
    assert _pick_c_block(8, 8, 100) == 100  # padded to 128 lanes but tiny HW


def test_pallas_interpret_matches_xla_forward():
    x, gamma, beta = _inputs()
    y_p, mean_p, rstd_p = _in_fwd_pallas(x, gamma, beta, 1e-3, False, True)
    y_x, mean_x, rstd_x = _in_fwd_xla(x, gamma, beta, 1e-3, False)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mean_p), np.asarray(mean_x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rstd_p), np.asarray(rstd_x), rtol=1e-4, atol=1e-6)


def test_pallas_interpret_with_relu():
    x, gamma, beta = _inputs(seed=1)
    y_p, _, _ = _in_fwd_pallas(x, gamma, beta, 1e-3, True, True)
    y_x, _, _ = _in_fwd_xla(x, gamma, beta, 1e-3, True)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=2e-5, atol=2e-5)
    assert float(jnp.min(y_p)) >= 0.0


def test_instance_norm_custom_vjp_matches_autodiff():
    """custom_vjp backward vs jax.grad through the plain-jnp definition."""
    x, gamma, beta = _inputs(b=1, h=6, w=5, c=8, seed=2)

    def plain(x, gamma, beta):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        xhat = (x - mean) * jax.lax.rsqrt(var + 1e-3)
        return xhat * gamma + beta

    def loss_custom(args):
        x_, g_, b_ = args
        y = instance_norm(x_, g_, b_, 1e-3, False, "xla")
        return jnp.sum(y * y)

    def loss_plain(args):
        x_, g_, b_ = args
        y = plain(x_, g_, b_)
        return jnp.sum(y * y)

    g_custom = jax.grad(loss_custom)((x, gamma, beta))
    g_plain = jax.grad(loss_plain)((x, gamma, beta))
    for a, b in zip(jax.tree.leaves(g_custom), jax.tree.leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_instance_norm_relu_gradient_masks():
    x, gamma, beta = _inputs(b=1, h=4, w=4, c=8, seed=3)

    def loss(x_):
        y = instance_norm(x_, gamma, beta, 1e-3, True, "xla")
        return jnp.sum(y)

    g = jax.grad(loss)(x)
    y = instance_norm(x, gamma, beta, 1e-3, True, "xla")
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.min(y)) >= 0.0


def test_pallas_interpret_backward_matches_xla():
    """The fused single-pass backward kernel == the XLA backward, with and
    without the fused ReLU (mask recomputed from the pre-activation)."""
    from imagegeneration_tpu.ops.pallas.instance_norm import (
        _in_bwd_pallas,
        _in_bwd_xla,
        _in_fwd_xla,
    )

    for relu, seed in ((False, 4), (True, 5)):
        x, gamma, beta = _inputs(b=2, h=8, w=8, c=16, seed=seed)
        _, mean, rstd = _in_fwd_xla(x, gamma, beta, 1e-3, relu)
        rng = np.random.default_rng(seed + 10)
        dy = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

        dx_p, dg_p, db_p = _in_bwd_pallas(
            x, dy, gamma, beta, mean, rstd, relu, interpret=True
        )
        dx_x, dg_x, db_x = _in_bwd_xla(x, dy, gamma, beta, mean, rstd, relu)
        np.testing.assert_allclose(
            np.asarray(dx_p), np.asarray(dx_x), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(dg_p), np.asarray(dg_x), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(db_p), np.asarray(db_x), rtol=2e-5, atol=2e-5
        )


def test_instance_norm_pallas_interpret_grad_matches_autodiff():
    """End-to-end custom_vjp with backend=pallas_interpret vs autodiff
    through the plain definition — pins the residual change (y dropped,
    ReLU mask recomputed) and the (B,1,C)-partial dgamma/dbeta reduction."""
    x, gamma, beta = _inputs(b=2, h=8, w=8, c=128, seed=6)

    def plain(x, gamma, beta, relu):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        xhat = (x - mean) * jax.lax.rsqrt(var + 1e-3)
        y = xhat * gamma + beta
        return jnp.maximum(y, 0.0) if relu else y

    for relu in (False, True):
        def loss_custom(args):
            x_, g_, b_ = args
            y = instance_norm(x_, g_, b_, 1e-3, relu, "pallas_interpret")
            return jnp.sum(y * y)

        def loss_plain(args):
            x_, g_, b_ = args
            return jnp.sum(plain(x_, g_, b_, relu) ** 2)

        g_custom = jax.grad(loss_custom)((x, gamma, beta))
        g_plain = jax.grad(loss_plain)((x, gamma, beta))
        for a, b in zip(jax.tree.leaves(g_custom), jax.tree.leaves(g_plain)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            )
