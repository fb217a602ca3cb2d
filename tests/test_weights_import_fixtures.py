"""End-to-end weight-file fixtures for the two previously unproven loaders:

1. evalx/pd.load_vgg16_params — a REAL Keras VGG16 (weights=None, seeded) is
   saved to .h5 and loaded; our Flax VGG16Features must reproduce the TF
   truncated model's layers[15] output (the reference's PD extractor,
   cyclegan/generator_evaluation.py:124-125).
2. compat/keras_import._in_params quirk path — a hand-authored
   save_weights-format .h5 whose InstanceNorm gamma/beta are per-HEIGHT
   vectors (the tensorflow_addons axis=1 artifact shape,
   cyclegan/CycleGAN.py:65-66) must import as (H,1,1) params that apply
   cleanly in a quirk_axis1=True generator.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
# The loaders read the LEGACY Keras-2 save_weights h5 layout (what the
# reference era produced); Keras 3's tf.keras writes .weights.h5 instead, so
# fixtures are authored with the standalone Keras-2 package.
keras = pytest.importorskip("tf_keras")
import h5py  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

tf.config.set_visible_devices([], "GPU")


def test_vgg16_h5_weights_load_and_match_tf(tmp_path):
    keras.utils.set_random_seed(11)
    vgg = keras.applications.VGG16(
        weights=None, include_top=False, input_shape=(224, 224, 3)
    )
    # layers[15] of the full reference model is block5_conv1; in the
    # include_top=False trunk the index is identical (same layer stack).
    assert vgg.layers[15].name == "block5_conv1"
    trunc = keras.Model(vgg.input, vgg.layers[15].output)
    weights_path = tmp_path / "vgg16_fixture.h5"
    vgg.save_weights(str(weights_path))

    from imagegeneration_tpu.evalx.pd import VGG16Features, load_vgg16_params

    loaded = load_vgg16_params(str(weights_path))
    randomed = load_vgg16_params(None)
    k_loaded = np.asarray(loaded["params"]["block1_conv1"]["kernel"])
    k_rand = np.asarray(randomed["params"]["block1_conv1"]["kernel"])
    assert not np.allclose(k_loaded, k_rand), "h5 weights were not loaded"
    np.testing.assert_array_equal(
        k_loaded, vgg.get_layer("block1_conv1").kernel.numpy()
    )

    x = np.random.default_rng(0).uniform(-1, 1, (2, 224, 224, 3)).astype(
        np.float32
    )
    theirs = trunc(x).numpy()
    ours = np.asarray(VGG16Features().apply(loaded, jnp.asarray(x)))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def _write_save_weights_h5(path, layers):
    """Author a minimal Keras-2 save_weights h5: root layer_names attr,
    per-layer weight_names attr + datasets at those (relative) paths —
    the layout tf_keras's save_weights produces (weight names are variable
    paths like 'conv2d_4/kernel:0', unique within the layer group)."""
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [name.encode() for name, _ in layers]
        )
        for name, weights in layers:
            g = f.create_group(name)
            wnames = []
            for k, (wname, arr) in enumerate(weights):
                rel = f"var_{k}/{wname}"  # unique relative variable path
                g.create_dataset(rel, data=arr)
                wnames.append(rel.encode())
            g.attrs["weight_names"] = np.array(wnames)


def test_cyclegan_axis1_quirk_h5_import(tmp_path):
    """tfa InstanceNormalization(axis=1) saves per-HEIGHT gamma/beta; the
    importer must land them as (H,1,1) and a quirk_axis1=True generator must
    apply them."""
    rng = np.random.default_rng(4)
    H = W = 32
    n_res = 1

    def conv(cin, cout, k):
        return [
            ("kernel:0", rng.normal(0, 0.05, (k, k, cin, cout)).astype("f4")),
            ("bias:0", np.zeros(cout, "f4")),
        ]

    def inorm(h):  # per-height params: the axis=1 artifact shape
        return [
            ("gamma:0", rng.uniform(0.5, 1.5, (h,)).astype("f4")),
            ("beta:0", rng.normal(0, 0.1, (h,)).astype("f4")),
        ]

    layers = [
        ("conv2d", conv(3, 64, 7)), ("instance_normalization", inorm(H)),
        ("conv2d_1", conv(64, 128, 3)),
        ("instance_normalization_1", inorm(H // 2)),
        ("conv2d_2", conv(128, 256, 3)),
        ("instance_normalization_2", inorm(H // 4)),
        # ResBlock: conv1, in1, conv2, in2 (CycleGAN.py:62-70)
        ("res_block", conv(256, 256, 3) + inorm(H // 4)
         + conv(256, 256, 3) + inorm(H // 4)),
        ("conv2d_transpose", [
            ("kernel:0", rng.normal(0, 0.05, (3, 3, 128, 256)).astype("f4")),
            ("bias:0", np.zeros(128, "f4")),
        ]),
        ("instance_normalization_5", inorm(H // 2)),
        ("conv2d_transpose_1", [
            ("kernel:0", rng.normal(0, 0.05, (3, 3, 64, 128)).astype("f4")),
            ("bias:0", np.zeros(64, "f4")),
        ]),
        ("instance_normalization_6", inorm(H)),
        ("conv2d_3", conv(64, 3, 7)), ("instance_normalization_7", inorm(H)),
    ]
    path = tmp_path / "cyclegan_axis1.h5"
    _write_save_weights_h5(path, layers)

    from imagegeneration_tpu.compat.keras_import import import_cyclegan_generator
    from imagegeneration_tpu.models.cyclegan import CycleGANConfig, Generator

    tree = import_cyclegan_generator(path)
    p = tree["params"]
    assert p["stem_in"]["scale"].shape == (H, 1, 1)
    assert p["down1_in"]["scale"].shape == (H // 4, 1, 1)
    assert p["res0"]["in1"]["scale"].shape == (H // 4, 1, 1)
    assert p["up1_in"]["scale"].shape == (H, 1, 1)

    cfg = CycleGANConfig(
        image_size=(H, W, 3), n_res_blocks=n_res, quirk_axis1=True,
        in_backend="xla",
    )
    gen = Generator(cfg)
    # Structural proof: the imported tree IS the model's parameter structure.
    ref = gen.init(jax.random.key(0), jnp.zeros((1, H, W, 3)))["params"]
    ref_shapes = jax.tree.map(jnp.shape, ref)
    got_shapes = jax.tree.map(np.shape, p)
    assert ref_shapes == got_shapes
    x = jnp.asarray(rng.uniform(-1, 1, (2, H, W, 3)).astype("f4"))
    out = gen.apply({"params": p}, x)
    assert out.shape == (2, H, W, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
