"""End-to-end reference-weights import parity: build the reference's Keras
architectures in TF, save .h5, import into our models, compare outputs.

Skipped when TensorFlow is unavailable (it is baked into this image; these
tests are the ground-truth check for compat/keras_import.py)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagegeneration_tpu.compat.keras_import import (  # noqa: E402
    convt_kernel_to_flax,
    import_sndcgan_discriminator,
    import_sndcgan_generator,
)
from imagegeneration_tpu.models.sndcgan import (  # noqa: E402
    Discriminator,
    Generator,
    SNDCGANConfig,
)

tf.config.set_visible_devices([], "GPU")

H, W = 48, 80  # tiny, divisible by 8


def _keras_generator():
    """The reference generator architecture (sndcgan/SNDCGAN.py:25-66)."""
    h8, w8 = H // 8, W // 8
    return tf.keras.Sequential([
        tf.keras.layers.Input(shape=(128,)),
        tf.keras.layers.Dense(512 * h8 * w8, use_bias=False),
        tf.keras.layers.BatchNormalization(),
        tf.keras.layers.ReLU(),
        tf.keras.layers.Reshape((h8, w8, 512)),
        tf.keras.layers.Conv2DTranspose(256, (4, 4), strides=(2, 2),
                                        padding="same", use_bias=False),
        tf.keras.layers.BatchNormalization(),
        tf.keras.layers.ReLU(),
        tf.keras.layers.Conv2DTranspose(128, (4, 4), strides=(2, 2),
                                        padding="same", use_bias=False),
        tf.keras.layers.BatchNormalization(),
        tf.keras.layers.ReLU(),
        tf.keras.layers.Conv2DTranspose(64, (4, 4), strides=(2, 2),
                                        padding="same", use_bias=False),
        tf.keras.layers.BatchNormalization(),
        tf.keras.layers.ReLU(),
        tf.keras.layers.Conv2DTranspose(3, (3, 3), strides=(1, 1),
                                        padding="same", use_bias=False,
                                        activation="tanh"),
    ])


def _keras_discriminator():
    """The reference discriminator (sndcgan/SNDCGAN.py:69-128), dropout off
    for deterministic comparison."""
    layers = [tf.keras.layers.Input(shape=(H, W, 3))]
    for filters, k, s in [(64, 3, 1), (128, 4, 2), (128, 3, 1), (256, 4, 2),
                          (256, 3, 1), (512, 4, 2), (512, 3, 1)]:
        layers.append(tf.keras.layers.Conv2D(filters, (k, k), strides=(s, s),
                                             padding="same"))
        layers.append(tf.keras.layers.LeakyReLU(negative_slope=0.1))
    layers += [tf.keras.layers.Flatten(), tf.keras.layers.Dense(1)]
    return tf.keras.Sequential(layers)


def test_convt_kernel_conversion_exact():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 8, 5)).astype(np.float32)
    layer = tf.keras.layers.Conv2DTranspose(
        7, (4, 4), strides=(2, 2), padding="same", use_bias=False
    )
    y_tf = layer(x).numpy()
    k_flax = convt_kernel_to_flax(layer.kernel.numpy())
    y_jax = jax.lax.conv_transpose(
        jnp.asarray(x), jnp.asarray(k_flax), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(y_jax), y_tf, atol=1e-5)


def test_generator_import_matches_keras_output(tmp_path):
    km = _keras_generator()
    # random-ish BN stats so inference mode is non-trivial
    for layer in km.layers:
        if isinstance(layer, tf.keras.layers.BatchNormalization):
            layer.moving_mean.assign(
                np.random.default_rng(1).normal(0, 0.1, layer.moving_mean.shape)
            )
            layer.moving_variance.assign(
                np.random.default_rng(2).uniform(0.5, 1.5,
                                                 layer.moving_variance.shape)
            )
    h5 = tmp_path / "gen_model-0.h5"
    km.save(h5, include_optimizer=False, save_format="h5")

    variables = import_sndcgan_generator(h5)
    gen = Generator(SNDCGANConfig(image_size=(H, W, 3)))

    z = np.random.default_rng(3).uniform(-1, 1, (2, 128)).astype(np.float32)
    y_tf = km(z, training=False).numpy()
    y_jax = np.asarray(
        gen.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(z), train=False,
        )
    )
    assert y_jax.shape == y_tf.shape == (2, H, W, 3)
    np.testing.assert_allclose(y_jax, y_tf, atol=2e-4)


def _keras_wgan_generator():
    """The reference WGAN generator (wasserstein_gan/WGAN.py:105-134)."""
    h8, w8 = H // 8, W // 8
    init = tf.keras.initializers.RandomNormal(stddev=0.02)
    return tf.keras.Sequential([
        tf.keras.layers.Input(shape=(128,)),
        tf.keras.layers.Dense(512 * h8 * w8, use_bias=False),
        tf.keras.layers.LeakyReLU(negative_slope=0.2),
        tf.keras.layers.Reshape((h8, w8, 512)),
        tf.keras.layers.Conv2DTranspose(256, (4, 4), strides=(2, 2),
                                        padding="same", use_bias=False,
                                        kernel_initializer=init),
        tf.keras.layers.BatchNormalization(),
        tf.keras.layers.LeakyReLU(negative_slope=0.2),
        tf.keras.layers.Conv2DTranspose(128, (4, 4), strides=(2, 2),
                                        padding="same", use_bias=False,
                                        kernel_initializer=init),
        tf.keras.layers.BatchNormalization(),
        tf.keras.layers.LeakyReLU(negative_slope=0.2),
        tf.keras.layers.Conv2DTranspose(64, (4, 4), strides=(2, 2),
                                        padding="same", use_bias=False,
                                        kernel_initializer=init),
        tf.keras.layers.BatchNormalization(),
        tf.keras.layers.LeakyReLU(negative_slope=0.2),
        tf.keras.layers.Conv2D(3, (3, 3), strides=(1, 1), padding="same",
                               use_bias=False, activation="tanh",
                               kernel_initializer=init),
    ])


def test_wgan_generator_import_matches_keras_output(tmp_path):
    from imagegeneration_tpu.compat.keras_import import import_wgan_generator
    from imagegeneration_tpu.models.wgan import Generator as WGen, WGANConfig

    km = _keras_wgan_generator()
    h5 = tmp_path / "model_0001.h5"
    km.save(h5, include_optimizer=False, save_format="h5")

    variables = import_wgan_generator(h5)
    gen = WGen(WGANConfig(image_size=(H, W, 3)))
    z = np.random.default_rng(5).normal(size=(2, 128)).astype(np.float32)
    y_tf = km(z, training=False).numpy()
    y_jax = np.asarray(
        gen.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(z), train=False,
        )
    )
    np.testing.assert_allclose(y_jax, y_tf, atol=2e-4)


def test_cyclegan_generator_import_matches_keras_output(tmp_path):
    """Build the reference CycleGAN generator structure in tf_keras (Keras 2,
    the reference's save_weights format) with GroupNormalization(groups=-1)
    standing in for per-channel InstanceNorm, save_weights, import, compare."""
    keras2 = pytest.importorskip("tf_keras")

    def conv_c7_s1(filters, use_tanh=False):
        return keras2.Sequential([
            keras2.layers.Conv2D(filters, (7, 7), strides=(1, 1), padding="same"),
            keras2.layers.GroupNormalization(groups=-1, epsilon=1e-3),
            keras2.layers.Activation("tanh") if use_tanh else keras2.layers.ReLU(),
        ])

    def d_conv(filters):
        return keras2.Sequential([
            keras2.layers.Lambda(
                lambda x: tf.pad(x, [[0, 0], [1, 1], [1, 1], [0, 0]], "REFLECT")
            ),
            keras2.layers.Conv2D(filters, (3, 3), strides=(2, 2)),
            keras2.layers.GroupNormalization(groups=-1, epsilon=1e-3),
            keras2.layers.ReLU(),
        ])

    def u_conv(filters):
        return keras2.Sequential([
            keras2.layers.Conv2DTranspose(filters, (3, 3), strides=(2, 2),
                                          padding="same"),
            keras2.layers.GroupNormalization(groups=-1, epsilon=1e-3),
            keras2.layers.ReLU(),
        ])

    class ResBlock(keras2.layers.Layer):
        """The reference ResBlock op order (cyclegan/CycleGAN.py:60-92)."""

        def __init__(self, filters):
            super().__init__()
            self.conv1 = keras2.layers.Conv2D(filters, (3, 3), padding="same")
            self.instance1 = keras2.layers.GroupNormalization(
                groups=-1, epsilon=1e-3
            )
            self.relu = keras2.layers.ReLU()
            self.conv2 = keras2.layers.Conv2D(filters, (3, 3), padding="same")
            self.instance2 = keras2.layers.GroupNormalization(
                groups=-1, epsilon=1e-3
            )

        def call(self, x):
            fx = self.conv1(x)
            fx = self.instance1(fx)
            fx = self.relu(fx)
            fx = self.conv2(fx)
            out = self.relu(x + fx)
            return self.instance2(out)

    base, n_res = 8, 2
    km = keras2.Sequential([
        keras2.layers.InputLayer((96, 96, 3)),
        conv_c7_s1(base),
        d_conv(base * 2), d_conv(base * 4),
        *[ResBlock(base * 4) for _ in range(n_res)],
        u_conv(base * 2), u_conv(base),
        conv_c7_s1(3, use_tanh=True),
    ])
    x = np.random.default_rng(6).uniform(-1, 1, (2, 96, 96, 3)).astype(np.float32)
    y_tf = km(x, training=False).numpy()
    h5 = tmp_path / "gen_weights_g-0.h5"
    km.save_weights(h5, save_format="h5")

    from imagegeneration_tpu.compat.keras_import import import_cyclegan_generator
    from imagegeneration_tpu.models.cyclegan import (
        CycleGANConfig, Generator as CycGen,
    )

    variables = import_cyclegan_generator(h5)
    gen = CycGen(CycleGANConfig(image_size=(96, 96, 3), base_width=base,
                                n_res_blocks=n_res, in_backend="xla"))
    y_jax = np.asarray(gen.apply(variables, jnp.asarray(x)))
    assert y_jax.shape == y_tf.shape
    np.testing.assert_allclose(y_jax, y_tf, atol=5e-4)


def test_discriminator_import_matches_keras_logits(tmp_path):
    km = _keras_discriminator()
    h5 = tmp_path / "disc_model-0.h5"
    km.save(h5, include_optimizer=False, save_format="h5")

    variables = import_sndcgan_discriminator(h5)
    disc = Discriminator(SNDCGANConfig(image_size=(H, W, 3), dropout_rate=0.0))
    x = np.random.default_rng(4).uniform(-1, 1, (2, H, W, 3)).astype(np.float32)
    y_tf = km(x, training=False).numpy()
    y_jax = np.asarray(
        disc.apply(
            {"params": variables["params"], "spectral": {}},
            jnp.asarray(x), train=False, update_sn=False,
        )
    )
    np.testing.assert_allclose(y_jax, y_tf, rtol=2e-4, atol=2e-4)
