"""InceptionV3 feature extractor: architecture + weight-import parity against
tf.keras.applications.InceptionV3 executed locally.

The TF model is built with weights=None, its BN beta/moving statistics are
randomized (so stat import is actually exercised, not identity), weights are
saved to a Keras .h5, imported through evalx/inception.load_inception_params,
and pooled features must match TF's pooling='avg' output."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
# tf_keras (Keras 2) writes the legacy save_weights h5 layout the loader
# reads (Keras 3's tf.keras only writes .weights.h5).
keras = pytest.importorskip("tf_keras")

import jax.numpy as jnp  # noqa: E402

tf.config.set_visible_devices([], "GPU")


@pytest.fixture(scope="module")
def tf_inception(tmp_path_factory):
    keras.utils.set_random_seed(23)
    model = keras.applications.InceptionV3(
        weights=None, include_top=False, pooling="avg",
        input_shape=(299, 299, 3),
    )
    rng = np.random.default_rng(9)
    for layer in model.layers:
        if isinstance(layer, keras.layers.BatchNormalization):
            beta, mean, var = layer.get_weights()
            layer.set_weights([
                rng.normal(0, 0.1, beta.shape).astype("f4"),
                rng.normal(0, 0.2, mean.shape).astype("f4"),
                rng.uniform(0.5, 1.5, var.shape).astype("f4"),
            ])
    path = tmp_path_factory.mktemp("inc") / "inception_fixture.h5"
    model.save_weights(str(path))
    return model, path


def test_inception_features_match_tf(tf_inception):
    model, weights_path = tf_inception
    from imagegeneration_tpu.evalx.inception import (
        InceptionV3Features,
        load_inception_params,
    )

    variables = load_inception_params(str(weights_path))
    x = np.random.default_rng(0).uniform(-1, 1, (2, 299, 299, 3)).astype("f4")
    theirs = model(x, training=False).numpy()
    ours = np.asarray(InceptionV3Features().apply(variables, jnp.asarray(x)))
    assert ours.shape == theirs.shape == (2, 2048)
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-3)


def test_inception_loader_falls_back_to_random(tmp_path, monkeypatch):
    """No-path call falls back to the deterministic fixed-seed init
    (relative-metric mode); an EXPLICITLY passed missing path is a user
    error and raises instead of silently scoring random features
    (ADVICE r2)."""
    import pytest

    from imagegeneration_tpu.evalx.inception import load_inception_params

    monkeypatch.delenv("IMAGEGEN_INCEPTION_WEIGHTS", raising=False)
    v1 = load_inception_params(None)
    v2 = load_inception_params(None)
    a = np.asarray(v1["params"]["conv2d"]["kernel"])
    b = np.asarray(v2["params"]["conv2d"]["kernel"])
    np.testing.assert_array_equal(a, b)  # deterministic fixed-seed init

    with pytest.raises(FileNotFoundError):
        load_inception_params(str(tmp_path / "missing.h5"))


def test_inception_fid_integration(tmp_path):
    """calculate_fid_from_features over inception features orders correctly:
    identical sets -> ~0, disjoint distributions -> larger."""
    from imagegeneration_tpu.evalx.fid import calculate_fid_from_features
    from imagegeneration_tpu.evalx.inception import (
        load_inception_params,
        make_feature_fn,
    )

    feat = make_feature_fn(load_inception_params(None))
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (8, 64, 64, 3)).astype("f4")
    b = np.clip(a + rng.normal(0, 0.5, a.shape), -1, 1).astype("f4")
    fa, fb = np.asarray(feat(a)), np.asarray(feat(b))
    same = calculate_fid_from_features(fa, fa)
    diff = calculate_fid_from_features(fa, fb)
    assert same < 1e-6
    assert diff > same
