"""d_updates stability knob: 2 = the reference's faithful double D apply
(SNDCGAN.py:251-267), 1 = standard single combined update."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
from imagegeneration_tpu.train.sndcgan_step import (
    SNDCGANTrainConfig,
    init_state,
    make_train_step,
)

H, W, B = 32, 40, 4


def _cfg(d_updates):
    return SNDCGANTrainConfig(
        model=SNDCGANConfig(image_size=(H, W, 3), dropout_rate=0.0),
        batch_size=B,
        d_updates=d_updates,
    )


@pytest.fixture(scope="module")
def batch():
    return jnp.asarray(
        np.random.default_rng(3).integers(0, 256, (B, H, W, 3), np.uint8)
    )


def test_single_update_applies_adam_once_per_step(batch):
    for d_updates, expected_count in ((1, 3), (2, 6)):
        cfg = _cfg(d_updates)
        state = init_state(cfg)
        step = jax.jit(make_train_step(cfg))
        for _ in range(3):
            state, metrics = step(state, batch)
        counts = [
            int(leaf)
            for leaf in jax.tree.leaves(state.d_opt)
            if getattr(leaf, "ndim", None) == 0 and leaf.dtype == jnp.int32
        ]
        assert counts and all(c == expected_count for c in counts)
        assert set(metrics) == {
            "g_loss", "d_loss", "d_loss_real", "d_loss_fake",
            "d_prob_real", "d_prob_fake",
        }


def test_g_update_unaffected_d_differs(batch):
    """Same seed: the G update precedes the D update(s) and must be
    identical across modes; the D parameters must differ."""
    states = {}
    for d_updates in (1, 2):
        cfg = _cfg(d_updates)
        state = init_state(cfg)
        step = jax.jit(make_train_step(cfg))
        state, _ = step(state, batch)
        states[d_updates] = state
    g1 = jax.tree.leaves(states[1].g_params)
    g2 = jax.tree.leaves(states[2].g_params)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    d_diff = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree.leaves(states[1].d_params),
            jax.tree.leaves(states[2].d_params),
        )
    )
    assert d_diff > 1e-6


def test_invalid_d_updates_rejected():
    with pytest.raises(ValueError, match="d_updates"):
        make_train_step(_cfg(3))
