"""ops/bitdropout: statistical correctness + custom-VJP mask consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagegeneration_tpu.ops.bitdropout import BitDropout, bit_dropout, hash_dropout


def test_keep_rate_matches_quantized_probability():
    key = jax.random.key(0)
    x = jnp.ones((512, 512), jnp.float32)
    for rate in (0.5, 0.25, 0.1, 0.73):
        y = np.asarray(bit_dropout(key, x, rate))
        cut = round(rate * 256)
        keep_prob = (256 - cut) / 256
        frac_kept = float((y != 0).mean())
        # binomial std over 262k samples ~ 1e-3
        assert frac_kept == pytest.approx(keep_prob, abs=5e-3), rate
        # inverted-dropout scale: kept values are exactly 1/keep_prob
        kept_vals = y[y != 0]
        np.testing.assert_allclose(kept_vals, 1.0 / keep_prob, rtol=1e-6)
        # unbiased: E[y] == 1
        assert float(y.mean()) == pytest.approx(1.0, abs=2e-2), rate


def test_rate_zero_and_one_edges():
    key = jax.random.key(1)
    x = jnp.ones((64, 64))
    np.testing.assert_array_equal(np.asarray(bit_dropout(key, x, 0.0)), 1.0)
    y = np.asarray(bit_dropout(key, x, 1.0))
    np.testing.assert_array_equal(y, 0.0)  # cut=256: nothing survives


def test_vjp_regenerates_identical_mask():
    """The backward pass recomputes the mask from the key; gradient support
    must exactly match the forward keep pattern, scaled identically."""
    key = jax.random.key(7)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(128, 128)), jnp.float32)

    y, vjp = jax.vjp(lambda t: bit_dropout(key, t, 0.5), x)
    (gx,) = vjp(jnp.ones_like(y))
    mask_fwd = np.asarray(y != 0)
    mask_bwd = np.asarray(gx != 0)
    np.testing.assert_array_equal(mask_fwd, mask_bwd)
    np.testing.assert_allclose(np.asarray(gx)[mask_bwd], 2.0, rtol=1e-6)


def test_deterministic_per_key():
    x = jnp.ones((256, 256))
    a = np.asarray(bit_dropout(jax.random.key(3), x, 0.5))
    b = np.asarray(bit_dropout(jax.random.key(3), x, 0.5))
    c = np.asarray(bit_dropout(jax.random.key(4), x, 0.5))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


@pytest.mark.parametrize("rounds", [1, 2])
def test_hash_keep_rate_matches_quantized_probability(rounds):
    key = jax.random.key(0)
    x = jnp.ones((512, 512), jnp.float32)
    for rate in (0.5, 0.25, 0.1, 0.73):
        y = np.asarray(hash_dropout(key, x, rate, rounds=rounds))
        cut = round(rate * 256)
        keep_prob = (256 - cut) / 256
        frac_kept = float((y != 0).mean())
        assert frac_kept == pytest.approx(keep_prob, abs=5e-3), rate
        kept_vals = y[y != 0]
        np.testing.assert_allclose(kept_vals, 1.0 / keep_prob, rtol=1e-6)
        assert float(y.mean()) == pytest.approx(1.0, abs=2e-2), rate


def test_hash_rate_edges():
    key = jax.random.key(1)
    x = jnp.ones((64, 64))
    np.testing.assert_array_equal(np.asarray(hash_dropout(key, x, 0.0)), 1.0)
    np.testing.assert_array_equal(np.asarray(hash_dropout(key, x, 1.0)), 0.0)


@pytest.mark.parametrize("rounds", [1, 2])
def test_hash_avalanche_no_neighbor_correlation(rounds):
    """The mask is a hash of the LINEAR element index, so the statistical
    risk is structure along the index: adjacent elements (last axis), rows
    (stride W), and planes (stride H*W) differ by small/regular index deltas.
    Murmur3 finalizer avalanche must decorrelate all of them.

    Pearson |r| between neighboring keep-bits in a 32x64x64 mask is binomial
    noise ~1/sqrt(n) ~ 3e-3 at n=131k if independent; assert < 0.02."""
    key = jax.random.key(42)
    x = jnp.ones((32, 64, 64), jnp.float32)
    m = (np.asarray(hash_dropout(key, x, 0.5, rounds=rounds)) != 0).astype(np.float64)
    for axis in range(m.ndim):
        a = np.moveaxis(m, axis, 0)
        r = np.corrcoef(a[:-1].ravel(), a[1:].ravel())[0, 1]
        assert abs(r) < 0.02, (axis, r)
    # and no row/column keep-rate banding: per-slice keep fraction stays
    # within binomial bounds (std = 0.5/sqrt(4096) ~ 0.008 per 64x64 slice)
    per_slice = m.mean(axis=(1, 2))
    assert per_slice.std() < 0.03


@pytest.mark.parametrize("rounds", [1, 2])
def test_hash_key_decorrelation_and_determinism(rounds):
    x = jnp.ones((256, 256))
    a = np.asarray(hash_dropout(jax.random.key(3), x, 0.5, rounds=rounds)) != 0
    b = np.asarray(hash_dropout(jax.random.key(3), x, 0.5, rounds=rounds)) != 0
    c = np.asarray(hash_dropout(jax.random.key(4), x, 0.5, rounds=rounds)) != 0
    np.testing.assert_array_equal(a, b)
    # masks from different keys agree on ~50% of positions (independent)
    agree = float((a == c).mean())
    assert 0.45 < agree < 0.55


@pytest.mark.parametrize("rounds", [1, 2])
def test_hash_vjp_regenerates_identical_mask(rounds):
    key = jax.random.key(7)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(128, 128)), jnp.float32)
    y, vjp = jax.vjp(lambda t: hash_dropout(key, t, 0.5, rounds=rounds), x)
    (gx,) = vjp(jnp.ones_like(y))
    np.testing.assert_array_equal(np.asarray(y != 0), np.asarray(gx != 0))
    np.testing.assert_allclose(np.asarray(gx)[np.asarray(gx) != 0], 2.0, rtol=1e-6)


@pytest.mark.parametrize("mode", ["hash", "hash1"])
def test_hash_mode_module(mode):
    x = jnp.ones((64, 64))
    y = BitDropout(rate=0.5, mode=mode).apply(
        {}, x, deterministic=False, rngs={"dropout": jax.random.key(0)}
    )
    frac = float((np.asarray(y) != 0).mean())
    assert frac == pytest.approx(0.5, abs=0.03)


def test_module_independent_streams_per_site():
    """Two BitDropout instances in one module draw different masks (flax
    folds the module path into make_rng)."""
    from flax import linen as fnn

    class TwoDrops(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            a = BitDropout(rate=0.5)(x, deterministic=False)
            b = BitDropout(rate=0.5)(x, deterministic=False)
            return a, b

    m = TwoDrops()
    x = jnp.ones((64, 64))
    a, b = m.apply({}, x, rngs={"dropout": jax.random.key(0)})
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_perf_relevant_defaults_pinned():
    """The headline bench numbers assume these defaults; accidental drift
    (a refactor flipping a flag) would silently change both perf and the
    dropout mask stream."""
    from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
    from imagegeneration_tpu.train.sndcgan_step import SNDCGANTrainConfig

    m = SNDCGANConfig()
    assert m.dropout_bits and m.dropout_hash and m.dropout_hash_rounds == 1
    t = SNDCGANTrainConfig()
    assert t.dropout_impl == "rbg" and t.opt_moments == "f32"


def test_opt_moments_validation_and_bf16_state():
    """opt_moments='bf16' stores Adam m/v in bfloat16 (update math f32);
    invalid values are rejected at build time."""
    import pytest as _pytest

    from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
    from imagegeneration_tpu.train import sndcgan_step

    cfg = sndcgan_step.SNDCGANTrainConfig(
        model=SNDCGANConfig(image_size=(16, 16, 3), base_width=16),
        batch_size=2, opt_moments="bf16",
    )
    state = sndcgan_step.init_state(cfg)
    mu_dtypes = {a.dtype for a in jax.tree.leaves(state.g_opt.mu)}
    assert mu_dtypes == {jnp.dtype(jnp.bfloat16)}

    bad = sndcgan_step.SNDCGANTrainConfig(
        model=SNDCGANConfig(image_size=(16, 16, 3), base_width=16),
        batch_size=2, opt_moments="fp8",
    )
    with _pytest.raises(ValueError, match="opt_moments"):
        sndcgan_step.build(bad)
