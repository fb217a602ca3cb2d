"""Reference-quirk compatibility flags: behavioral difference tests."""

import jax
import jax.numpy as jnp
import numpy as np

from imagegeneration_tpu.models.sndcgan import Generator, SNDCGANConfig
from imagegeneration_tpu.nn.layers import InstanceNorm

TINY = (16, 16, 3)


def test_quirk_eval_bn_uses_moving_stats_during_training():
    """quirk_eval_bn reproduces the reference's accidental inference-mode
    generator BN (sndcgan/SNDCGAN.py:243): with init moving stats (mean 0,
    var 1), train-mode and quirk-mode outputs differ, and quirk train-mode
    output equals eval-mode output."""
    z = jnp.asarray(np.random.default_rng(0).normal(size=(4, 128)), jnp.float32)

    gen_q = Generator(SNDCGANConfig(image_size=TINY, base_width=16,
                                    quirk_eval_bn=True))
    gen_c = Generator(SNDCGANConfig(image_size=TINY, base_width=16))
    v = gen_q.init(jax.random.key(0), z[:1], train=False)

    y_quirk_train, _ = gen_q.apply(v, z, train=True, mutable=["batch_stats"])
    y_quirk_eval = gen_q.apply(v, z, train=False)
    np.testing.assert_allclose(
        np.asarray(y_quirk_train), np.asarray(y_quirk_eval), atol=1e-6
    )

    y_corrected, _ = gen_c.apply(v, z, train=True, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(y_corrected), np.asarray(y_quirk_train))


def test_quirk_eval_bn_never_updates_batch_stats():
    z = jnp.zeros((4, 128))
    gen_q = Generator(SNDCGANConfig(image_size=TINY, base_width=16,
                                    quirk_eval_bn=True))
    v = gen_q.init(jax.random.key(0), z[:1], train=False)
    _, mut = gen_q.apply(v, z + 0.5, train=True, mutable=["batch_stats"])
    for old, new in zip(
        jax.tree.leaves(v["batch_stats"]), jax.tree.leaves(mut["batch_stats"])
    ):
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))


def test_quirk_axis1_normalizes_over_wc():
    """axis=1 IN (tfa quirk): per-H-position stats over (W, C); the corrected
    default uses per-channel stats over (H, W)."""
    x = jnp.asarray(
        np.random.default_rng(1).normal(2.0, 3.0, (1, 6, 5, 4)), jnp.float32
    )
    identity = {"params": {"scale": None, "bias": None}}

    m_q = InstanceNorm(quirk_axis1=True)
    v_q = m_q.init(jax.random.key(0), x)
    v_q = {
        "params": {
            "scale": jnp.ones_like(v_q["params"]["scale"]),
            "bias": jnp.zeros_like(v_q["params"]["bias"]),
        }
    }
    y_q = np.asarray(m_q.apply(v_q, x))
    # each H-slice normalized over (W, C)
    assert abs(y_q[0, 2].mean()) < 1e-4
    assert abs(y_q[0, 2].std() - 1.0) < 2e-2

    m_c = InstanceNorm()
    v_c = {
        "params": {"scale": jnp.ones(4), "bias": jnp.zeros(4)}
    }
    y_c = np.asarray(m_c.apply(v_c, x))
    # each channel normalized over (H, W)
    assert abs(y_c[0, :, :, 1].mean()) < 1e-4
    assert not np.allclose(y_q, y_c)
