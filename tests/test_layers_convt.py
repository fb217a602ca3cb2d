"""nn.layers.ConvTranspose stride-1 lowering: the plain-conv fast path must
be numerically identical to flax's lax.conv_transpose formulation (same
params, same forward, same gradients) — it exists only to dodge the
activation-reverse XLA emits for conv_transpose's dW (benchmarks/README.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as fnn

from imagegeneration_tpu.nn.layers import ConvTranspose


def _ref_apply(kernel, x):
    """flax's own ConvTranspose lowering (what the fast path replaces)."""
    mod = fnn.ConvTranspose(
        features=kernel.shape[-1], kernel_size=kernel.shape[:2],
        strides=(1, 1), padding="SAME", use_bias=False,
    )
    return mod.apply({"params": {"kernel": kernel}}, x)


def test_s1_fast_path_matches_conv_transpose_fwd_and_grad(monkeypatch):
    # Default-on (ADVICE r3): with the env UNSET the wrapper must take the
    # plain-conv lowering, so this comparison vs flax's generic
    # lax.conv_transpose formulation actually exercises the fast path.
    monkeypatch.delenv("IMAGEGEN_CONVT_IMPL", raising=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 9, 11, 5)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 5, 4)), jnp.float32)

    mod = ConvTranspose(4, (3, 3), (1, 1), "SAME", use_bias=False)
    vars_ = mod.init(jax.random.key(0), x)
    # identical parameter path as the generic lowering
    assert "kernel" in vars_["params"]["ConvTranspose_0"]
    assert vars_["params"]["ConvTranspose_0"]["kernel"].shape == (3, 3, 5, 4)

    params = {"ConvTranspose_0": {"kernel": kernel}}
    y = mod.apply({"params": params}, x)
    y_ref = _ref_apply(kernel, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)

    # gradients wrt kernel and input agree with the reference lowering
    g = jax.grad(lambda k, t: jnp.sum(mod.apply(
        {"params": {"ConvTranspose_0": {"kernel": k}}}, t) ** 2), argnums=(0, 1))
    g_ref = jax.grad(lambda k, t: jnp.sum(_ref_apply(k, t) ** 2), argnums=(0, 1))
    for a, b in zip(g(kernel, x), g_ref(kernel, x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_s1_fast_path_hlo_identical(monkeypatch):
    """The strongest possible exactness pin: the default (plain-conv) s1
    lowering and the IMAGEGEN_CONVT_IMPL=lax generic lowering produce
    IDENTICAL StableHLO for the fwd+grad program, modulo the module name and
    location metadata. This proves bitwise-identical numerics AND that the
    generic path currently has no extra activation reverse to dodge — the
    fast path stays as a structural guard against transpose-rule regressions
    (see nn/layers.py ConvTranspose docstring)."""
    import re

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 9, 11, 5)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 5, 4)), jnp.float32)
    mod = ConvTranspose(4, (3, 3), (1, 1), "SAME", use_bias=False)

    def loss(k, t):
        return jnp.sum(mod.apply({"params": {"ConvTranspose_0": {"kernel": k}}}, t) ** 2)

    def lowered_text():
        txt = jax.jit(jax.grad(loss, argnums=(0, 1))).lower(kernel, x).as_text()
        txt = re.sub(r"loc\(.*?\)", "", txt)
        txt = "\n".join(
            l.split("loc(")[0].rstrip() for l in txt.splitlines() if "#loc" not in l
        )
        return re.sub(r"@jit_\w+", "@jit_fn", txt)

    monkeypatch.delenv("IMAGEGEN_CONVT_IMPL", raising=False)
    fast = lowered_text()
    monkeypatch.setenv("IMAGEGEN_CONVT_IMPL", "lax")
    generic = lowered_text()
    assert fast == generic


def _ref_apply_s2(kernel, x, bias=None):
    mod = fnn.ConvTranspose(
        features=kernel.shape[-1], kernel_size=kernel.shape[:2],
        strides=(2, 2), padding="SAME", use_bias=bias is not None,
    )
    params = {"kernel": kernel}
    if bias is not None:
        params["bias"] = bias
    return mod.apply({"params": params}, x)


@pytest.mark.parametrize("impl", ["hybrid", "phase", "packed", "swapdw"])
@pytest.mark.parametrize("ksize,odd_hw", [((4, 4), False), ((3, 3), True)])
def test_s2_paths_match_conv_transpose_fwd_and_grad(ksize, odd_hw, impl, monkeypatch):
    """Hybrid (lax fwd/dx + reverse-free per-phase dW) and full phase
    decomposition == lax.conv_transpose for the repo's two stride-2 shapes:
    4x4 (SNDCGAN/WGAN up blocks) and 3x3 (CycleGAN up blocks), on odd and
    even input sizes. Both are opt-in A/B levers (measured a wash / slower
    than XLA's dilated conv at the headline config — see nn/layers.py)."""
    monkeypatch.setenv("IMAGEGEN_CONVT_IMPL", impl)
    rng = np.random.default_rng(2)
    hw = (9, 11) if odd_hw else (6, 10)
    x = jnp.asarray(rng.normal(size=(2, *hw, 5)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(*ksize, 5, 4)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(4,)), jnp.float32)

    mod = ConvTranspose(4, ksize, (2, 2), "SAME", use_bias=True)
    vars_ = mod.init(jax.random.key(0), x)
    # identical parameter path/shapes as the generic lowering
    assert set(vars_["params"]["ConvTranspose_0"]) == {"kernel", "bias"}
    assert vars_["params"]["ConvTranspose_0"]["kernel"].shape == (*ksize, 5, 4)

    params = {"ConvTranspose_0": {"kernel": kernel, "bias": bias}}
    y = mod.apply({"params": params}, x)
    assert y.shape == (2, 2 * hw[0], 2 * hw[1], 4)
    y_ref = _ref_apply_s2(kernel, x, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)

    g = jax.grad(lambda k, t: jnp.sum(mod.apply(
        {"params": {"ConvTranspose_0": {"kernel": k, "bias": bias}}}, t) ** 2),
        argnums=(0, 1))
    g_ref = jax.grad(lambda k, t: jnp.sum(_ref_apply_s2(k, t, bias) ** 2),
                     argnums=(0, 1))
    for a, b in zip(g(kernel, x), g_ref(kernel, x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


@pytest.mark.parametrize("ksize,odd_hw", [((4, 4), False), ((3, 3), True)])
def test_s2_default_is_swapdw_fwd_dx_bitexact(ksize, odd_hw, monkeypatch):
    """The stride-2 SAME default (env UNSET) is the swapdw lowering: forward
    and dx are BIT-identical to the generic lax lowering (same primitives —
    only dW is re-derived), and dW agrees to fp-reassociation level. The
    role-swap identity: convT's dW equals the flipped/io-swapped weight-grad
    of the plain forward strided conv with lhs=dy, cotangent=x (see
    nn/layers.py _conv_transpose2_swapdw; chip win 44.40 -> 42.57 ms/step)."""
    rng = np.random.default_rng(4)
    hw = (9, 11) if odd_hw else (6, 10)
    x = jnp.asarray(rng.normal(size=(2, *hw, 5)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(*ksize, 5, 4)), jnp.float32)
    mod = ConvTranspose(4, ksize, (2, 2), "SAME", use_bias=False)

    def outputs():
        params = {"ConvTranspose_0": {"kernel": kernel}}
        y = mod.apply({"params": params}, x)
        dk, dx = jax.grad(
            lambda k, t: jnp.sum(
                mod.apply({"params": {"ConvTranspose_0": {"kernel": k}}}, t)
                ** 2
            ),
            argnums=(0, 1),
        )(kernel, x)
        return np.asarray(y), np.asarray(dk), np.asarray(dx)

    monkeypatch.delenv("IMAGEGEN_CONVT_IMPL", raising=False)
    y_fast, dk_fast, dx_fast = outputs()
    monkeypatch.setenv("IMAGEGEN_CONVT_IMPL", "lax")
    y_lax, dk_lax, dx_lax = outputs()

    np.testing.assert_array_equal(y_fast, y_lax)   # fwd bit-identical
    np.testing.assert_array_equal(dx_fast, dx_lax)  # dx bit-identical
    np.testing.assert_allclose(dk_fast, dk_lax, rtol=1e-5, atol=1e-5)


def test_generic_env_escape_hatch(monkeypatch):
    """IMAGEGEN_CONVT_IMPL=lax forces the generic lowering (A/B switch)."""
    monkeypatch.setenv("IMAGEGEN_CONVT_IMPL", "lax")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 3)), jnp.float32)
    mod = ConvTranspose(8, (4, 4), (2, 2), "SAME", use_bias=False)
    vars_ = mod.init(jax.random.key(0), x)
    y = mod.apply(vars_, x)
    assert y.shape == (2, 12, 12, 8)
    kernel = vars_["params"]["ConvTranspose_0"]["kernel"]
    ref = fnn.ConvTranspose(8, (4, 4), (2, 2), "SAME", use_bias=False)
    y_ref = ref.apply({"params": {"kernel": kernel}}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)
