"""Golden step-1 metrics for the three fused train steps (fixed seed 62).

These pin the *semantics* of each fused step (update order, loss
composition, PRNG stream usage) against accidental refactor drift. Values
were produced on the CPU backend; tolerances absorb backend/version-level
float reassociation but not semantic changes (a wrong label, a swapped
update order, a different PRNG fold all shift these by >> the tolerance).
"""

import jax
import numpy as np
import pytest

TOL = dict(rel=5e-3, abs=5e-4)


def _batch(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def test_sndcgan_step1_goldens():
    from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
    from imagegeneration_tpu.train.sndcgan_step import (
        SNDCGANTrainConfig, init_state, make_train_step,
    )

    cfg = SNDCGANTrainConfig(
        model=SNDCGANConfig(image_size=(16, 16, 3), base_width=16,
                            dropout_rate=0.25, dropout_bits=False),
        batch_size=2, seed=62,
        dropout_impl="threefry",  # goldens were recorded on this stream
    )
    _, m = jax.jit(make_train_step(cfg))(init_state(cfg), _batch((2, 16, 16, 3), 2024))
    golden = {
        "d_loss": 1.422473, "d_loss_fake": 0.729143, "d_loss_real": 0.693331,
        "d_prob_fake": 0.517656, "d_prob_real": 0.499911, "g_loss": 0.690644,
    }
    for k, v in golden.items():
        assert float(m[k]) == pytest.approx(v, **TOL), k


def test_sndcgan_step1_goldens_bitdropout():
    """Same semantics pin for the default bit-packed dropout path (different
    mask stream, so its own recorded values)."""
    from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
    from imagegeneration_tpu.train.sndcgan_step import (
        SNDCGANTrainConfig, init_state, make_train_step,
    )

    cfg = SNDCGANTrainConfig(
        model=SNDCGANConfig(image_size=(16, 16, 3), base_width=16,
                            dropout_rate=0.25, dropout_bits=True,
                            dropout_hash=False),
        batch_size=2, seed=62,
        dropout_impl="threefry",
    )
    _, m = jax.jit(make_train_step(cfg))(init_state(cfg), _batch((2, 16, 16, 3), 2024))
    golden = {
        "d_loss": 1.423676, "d_loss_fake": 0.727721, "d_loss_real": 0.695955,
        "d_prob_fake": 0.516991, "d_prob_real": 0.498598, "g_loss": 0.689171,
    }
    for k, v in golden.items():
        assert float(m[k]) == pytest.approx(v, **TOL), k


@pytest.mark.parametrize(
    "rounds,golden",
    [
        # 2-round stream (round-2 default; values recorded then)
        (2, {
            "d_loss": 1.41617, "d_loss_fake": 0.728507,
            "d_loss_real": 0.687664, "d_prob_fake": 0.517368,
            "d_prob_real": 0.502749, "g_loss": 0.691282,
        }),
        # 1-round stream (round-3 default: half the mask VPU work,
        # same quality gates — see ops/bitdropout._hash_mask)
        (1, {
            "d_loss": 1.415125, "d_loss_fake": 0.729010,
            "d_loss_real": 0.686115, "d_prob_fake": 0.517613,
            "d_prob_real": 0.503528, "g_loss": 0.686828,
        }),
    ],
)
def test_sndcgan_step1_goldens_hashdropout(rounds, golden):
    """Semantics pin for the counter-hash dropout path (the default;
    each rounds setting is its own mask stream, so its own recorded
    values)."""
    from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
    from imagegeneration_tpu.train.sndcgan_step import (
        SNDCGANTrainConfig, init_state, make_train_step,
    )

    cfg = SNDCGANTrainConfig(
        model=SNDCGANConfig(image_size=(16, 16, 3), base_width=16,
                            dropout_rate=0.25, dropout_hash_rounds=rounds),
        batch_size=2, seed=62,
        dropout_impl="threefry",
    )
    _, m = jax.jit(make_train_step(cfg))(init_state(cfg), _batch((2, 16, 16, 3), 2024))
    for k, v in golden.items():
        assert float(m[k]) == pytest.approx(v, **TOL), k


def test_wgan_step1_goldens():
    from imagegeneration_tpu.models.wgan import WGANConfig
    from imagegeneration_tpu.train import wgan_step

    cfg = wgan_step.WGANTrainConfig(
        model=WGANConfig(image_size=(16, 16, 3), base_width=16),
        batch_size=2, n_critic=1, seed=62,
    )
    _, m = jax.jit(wgan_step.make_train_step(cfg))(
        wgan_step.init_state(cfg), _batch((2, 16, 16, 3), 2024)
    )
    golden = {
        "c_loss_fake": 2.299989, "c_loss_real": -0.463595,
        "did_gan_update": 1.0, "g_loss": 2.236334,
    }
    for k, v in golden.items():
        assert float(m[k]) == pytest.approx(v, **TOL), k


def test_cyclegan_step1_goldens():
    from imagegeneration_tpu.models.cyclegan import CycleGANConfig
    from imagegeneration_tpu.train import cyclegan_step

    cfg = cyclegan_step.CycleGANTrainConfig(
        model=CycleGANConfig(image_size=(96, 96, 3), base_width=8,
                             n_res_blocks=1),
        batch_size=1, seed=62,
    )
    _, m = jax.jit(cyclegan_step.make_train_step(cfg))(
        cyclegan_step.init_state(cfg),
        _batch((1, 96, 96, 3), 7), _batch((1, 96, 96, 3), 8),
    )
    golden = {
        "disc_x_loss": 0.694707, "disc_y_loss": 0.693789,
        "gen_f_loss": 0.689433, "gen_g_loss": 0.673286,
        "identity_loss_f": 2.510168, "identity_loss_g": 2.500438,
        "total_cycle_loss": 10.02124,
        "total_gen_f_loss": 13.22084, "total_gen_g_loss": 13.194963,
    }
    for k, v in golden.items():
        assert float(m[k]) == pytest.approx(v, **TOL), k
