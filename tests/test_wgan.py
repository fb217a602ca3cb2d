"""WGAN tests: constraint semantics, n_critic cadence, frozen-critic quirk."""

import jax
import jax.numpy as jnp
import numpy as np

from imagegeneration_tpu.models.wgan import (
    WGANConfig,
    clip_critic_kernels,
    critic_bn_mask,
    make_models,
)
from imagegeneration_tpu.train.common import wasserstein_loss
from imagegeneration_tpu.train.wgan_step import (
    WGANTrainConfig,
    init_state,
    make_sampler,
    make_train_step,
)

TINY = (48, 80, 3)


def test_wasserstein_loss_golden():
    """mean(y_true*y_pred) (WGAN.py:48-49)."""
    y = jnp.asarray([[1.0], [1.0]])
    p = jnp.asarray([[2.0], [4.0]])
    assert float(wasserstein_loss(y, p)) == 3.0
    assert float(wasserstein_loss(-y, p)) == -3.0


def test_generator_uses_plain_conv_head():
    """WGAN generator head is Conv2D (not ConvT) — WGAN.py:131."""
    cfg = WGANConfig(image_size=TINY)
    gen, _ = make_models(cfg)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 128)), train=False)
    head = variables["params"]["to_rgb"]["Conv_0"]["kernel"]
    assert head.shape == (3, 3, 64, 3)
    out = gen.apply(variables, jnp.ones((2, 128)), train=False)
    assert out.shape == (2, *TINY)


def test_clip_constraint_targets_only_conv_kernels():
    cfg = WGANConfig(image_size=TINY)
    _, critic = make_models(cfg)
    variables = critic.init(
        jax.random.key(0), jnp.zeros((1, *TINY)), train=False
    )
    params = jax.tree.map(lambda x: jnp.full_like(x, 0.5), variables["params"])
    clipped = clip_critic_kernels(params)
    # conv kernels clipped to 0.01 (float32 representation)
    assert abs(float(jnp.max(clipped["conv0"]["Conv_0"]["kernel"])) - 0.01) < 1e-8
    # conv bias NOT clipped
    assert float(jnp.max(clipped["conv0"]["Conv_0"]["bias"])) == 0.5
    # BN scale NOT clipped
    bn_leaf = jax.tree.leaves(clipped["conv0_bn"])[0]
    assert float(jnp.max(bn_leaf)) == 0.5
    # Dense head NOT clipped (reference gives it no constraint, WGAN.py:96)
    assert float(jnp.max(clipped["head"]["Dense_0"]["kernel"])) == 0.5


def test_bn_mask_selects_only_bn():
    cfg = WGANConfig(image_size=TINY)
    _, critic = make_models(cfg)
    variables = critic.init(
        jax.random.key(0), jnp.zeros((1, *TINY)), train=False
    )
    mask = critic_bn_mask(variables["params"])
    assert mask["conv0_bn"]["BatchNorm_0"]["scale"] is True
    assert mask["conv0"]["Conv_0"]["kernel"] is False
    assert mask["head"]["Dense_0"]["kernel"] is False


def test_n_critic_cadence_and_frozen_critic():
    cfg = WGANTrainConfig(
        model=WGANConfig(image_size=TINY), batch_size=2, n_critic=3
    )
    state = init_state(cfg)
    step = jax.jit(make_train_step(cfg))
    batch = np.random.default_rng(0).integers(0, 256, (2, *TINY), dtype=np.uint8)

    g_kernel0 = np.asarray(state.g_params["stem"]["Dense_0"]["kernel"])
    did = []
    c_conv_before_gan = None
    c_bn_before_gan = None
    for i in range(3):
        if i == 2:
            c_conv_before_gan = np.asarray(state.c_params["conv0"]["Conv_0"]["kernel"])
            c_bn_before_gan = np.asarray(
                state.c_params["conv0_bn"]["BatchNorm_0"]["scale"]
            )
        state, m = step(state, batch)
        did.append(float(m["did_gan_update"]))
    assert did == [0.0, 0.0, 1.0]
    assert int(state.critic_count) == 0
    # generator moved only via the 3rd step's gan update
    g_kernel3 = np.asarray(state.g_params["stem"]["Dense_0"]["kernel"])
    assert not np.allclose(g_kernel0, g_kernel3)
    # during the gan step: critic conv kernels frozen...
    c_conv_after = np.asarray(state.c_params["conv0"]["Conv_0"]["kernel"])
    # (conv kernels DO change in steps 1-3 from the critic updates themselves;
    # compare around the gan branch: the critic update inside step 3 changes
    # them, so instead verify the BN params moved and kernels stayed clipped)
    assert np.max(np.abs(c_conv_after)) <= 0.01 + 1e-7
    c_bn_after = np.asarray(state.c_params["conv0_bn"]["BatchNorm_0"]["scale"])
    assert not np.allclose(c_bn_before_gan, c_bn_after)


def test_critic_kernels_clipped_after_every_step():
    cfg = WGANTrainConfig(model=WGANConfig(image_size=TINY), batch_size=2)
    state = init_state(cfg)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    batch = np.random.default_rng(1).integers(0, 256, (2, *TINY), dtype=np.uint8)
    state, _ = step(state, batch)
    for i in range(7):
        k = np.asarray(state.c_params[f"conv{i}"]["Conv_0"]["kernel"])
        assert np.max(np.abs(k)) <= 0.01 + 1e-7


def test_epoch_runner_matches_streaming():
    """The device-resident scan epoch equals per-batch stepping, including
    the cross-batch critic counter and the conditional gan update."""
    from imagegeneration_tpu.train.wgan_step import make_epoch_runner

    cfg = WGANTrainConfig(
        model=WGANConfig(image_size=TINY, base_width=32), batch_size=2, n_critic=2
    )
    images = np.random.default_rng(5).integers(0, 256, (8, *TINY), dtype=np.uint8)
    perm = np.arange(8).reshape(4, 2)

    step = jax.jit(make_train_step(cfg))
    s_stream = init_state(cfg)
    dids = []
    for b in range(4):
        s_stream, m = step(s_stream, images[perm[b]])
        dids.append(float(m["did_gan_update"]))
    assert dids == [0.0, 1.0, 0.0, 1.0]  # n_critic=2 cadence

    runner = jax.jit(make_epoch_runner(cfg))
    s_scan, metrics = runner(init_state(cfg), jnp.asarray(images), jnp.asarray(perm))
    np.testing.assert_array_equal(
        np.asarray(metrics["did_gan_update"]), np.asarray(dids)
    )
    # RMSprop's g/sqrt(nu)+eps normalization makes near-zero-grad entries
    # rounding-sensitive across fusion layouts (updates flip by ~lr); the
    # scan path must agree to within a few lr units on average.
    ka = np.asarray(s_stream.g_params["stem"]["Dense_0"]["kernel"])
    kb = np.asarray(s_scan.g_params["stem"]["Dense_0"]["kernel"])
    assert np.mean(np.abs(ka - kb)) < 1e-4
    assert int(s_scan.critic_count) == int(s_stream.critic_count) == 0


def test_gradient_penalty_mode():
    """gp_lambda > 0: kernels NOT clipped, penalty active, step finite."""
    cfg = WGANTrainConfig(
        model=WGANConfig(image_size=TINY, base_width=16),
        batch_size=2, n_critic=1, gp_lambda=10.0, learning_rate=1e-3,
    )
    state = init_state(cfg)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    batch = np.random.default_rng(3).integers(0, 256, (2, *TINY), dtype=np.uint8)
    for _ in range(4):
        state, m = step(state, batch)
    assert np.isfinite(float(m["c_loss_real"]))
    assert np.isfinite(float(m["g_loss"]))
    # with clipping disabled, RMSprop at lr 1e-3 pushes kernels past +-0.01
    k = np.asarray(state.c_params["conv0"]["Conv_0"]["kernel"])
    assert np.max(np.abs(k)) > 0.011


def test_sampler_range():
    cfg = WGANTrainConfig(model=WGANConfig(image_size=TINY), batch_size=2)
    state = init_state(cfg)
    sample = jax.jit(make_sampler(cfg))
    z = jnp.zeros((2, 128))
    imgs = np.asarray(sample(state, z))
    assert imgs.shape == (2, *TINY)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
