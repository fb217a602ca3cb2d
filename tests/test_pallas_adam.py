"""Fused Pallas Adam apply vs the XLA Keras-form path.

The kernel (ops/pallas/adam.py) exists to cut optimizer HBM traffic on the
headline step WITHOUT changing the Keras-exact Adam form. The bar is
exact-form equality with the only freedom being FMA contraction: kernel
and XLA evaluate the identical f32 expressions, so elementwise results
must agree to <=2 ulp (measured 2.4e-7 on N(0,1) data); XLA-fallback
leaves inside adam_apply must stay BITWISE equal to the optax route (same
compiler, same expressions). Interpret mode stands in for the TPU lowering
on this CPU host; the chip A/B lives in benchmarks/README.md round-5
notes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from imagegeneration_tpu.ops.pallas.adam import (
    MIN_FUSED_SIZE,
    fused_adam_leaf,
    leaf_eligible,
)
from imagegeneration_tpu.train import common

B1, B2 = 0.9, 0.999


def _ref_leaf(p, g, m, v, alpha):
    m32 = B1 * m + (1.0 - B1) * g
    v32 = B2 * v + (1.0 - B2) * jnp.square(g)
    return p + (-alpha * m32 / (jnp.sqrt(v32) + common.KERAS_EPS)), m32, v32


def test_kernel_matches_xla_formula_to_ulp():
    rng = np.random.default_rng(0)
    shape = (1024, 1024)  # 1M elements: eligible, lane-aligned
    p, g, m = (
        jnp.asarray(rng.normal(size=shape).astype(np.float32)) for _ in range(3)
    )
    # second moments are non-negative by construction in Adam
    v = jnp.asarray(np.abs(rng.normal(size=shape)).astype(np.float32))
    alpha = jnp.float32(2e-4 * np.sqrt(1 - B2) / (1 - B1))
    got = fused_adam_leaf(
        p, g, m, v, alpha, b1=B1, b2=B2, eps=common.KERAS_EPS, interpret=True
    )
    want = _ref_leaf(p, g, m, v, alpha)
    for a, b, name in zip(got, want, ("p", "m", "v")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-7, atol=2e-8,
            err_msg=f"{name} beyond FMA-contraction ulp bound",
        )


def test_adam_apply_matches_optax_path():
    """adam_apply (mixed fused + XLA-fallback leaves) must reproduce
    adam().update + optax.apply_updates over several steps: BITWISE on the
    XLA-fallback leaves (small bias, odd-sized kernel — same compiler, same
    expressions) and to FMA-contraction ulp on the fused leaf."""
    rng = np.random.default_rng(1)
    params = {
        "stem": jnp.asarray(rng.normal(size=(1024, 1024)).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(size=(512,)).astype(np.float32)),
        "odd": jnp.asarray(rng.normal(size=(7, 13)).astype(np.float32)),
    }
    assert leaf_eligible(params["stem"], params["stem"])
    assert not leaf_eligible(params["bias"], params["bias"])

    lr = 2e-4
    tx = common.adam(lr, b1=B1, b2=B2)
    s_ref = tx.init(params)
    s_fused = tx.init(params)
    p_ref, p_fused = params, params
    for step in range(3):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                np.random.default_rng(10 + step).normal(size=p.shape)
                .astype(np.float32)
            ),
            params,
        )
        upd, s_ref = tx.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)
        p_fused, s_fused = common.adam_apply(
            p_fused, grads, s_fused, learning_rate=lr, b1=B1, b2=B2,
            fused="interpret",
        )
        for key in params:
            check = (
                np.testing.assert_array_equal if key != "stem"
                else functools.partial(
                    np.testing.assert_allclose, rtol=1e-6, atol=1e-7
                )
            )
            check(np.asarray(p_ref[key]), np.asarray(p_fused[key]),
                  err_msg=f"step {step} params[{key}]")
            check(np.asarray(s_ref.mu[key]), np.asarray(s_fused.mu[key]),
                  err_msg=f"step {step} mu[{key}]")
            check(np.asarray(s_ref.nu[key]), np.asarray(s_fused.nu[key]),
                  err_msg=f"step {step} nu[{key}]")
        assert int(s_fused.count) == step + 1


def test_adam_apply_off_mode_and_bf16_moments():
    """fused='off' and the bf16-moments knob both take the XLA path and
    match common.adam exactly (the knob is trajectory-changing by design;
    the equality here is vs the same-knob optax route)."""
    rng = np.random.default_rng(2)
    params = {"w": jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))}
    grads = {"w": jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))}
    for mdt in (None, jnp.bfloat16):
        tx = common.adam(1e-3, moment_dtype=mdt)
        s0 = tx.init(params)
        upd, s1 = tx.update(grads, s0, params)
        want = optax.apply_updates(params, upd)
        got, s1b = common.adam_apply(
            params, grads, s0, learning_rate=1e-3, moment_dtype=mdt,
            fused="off",
        )
        np.testing.assert_array_equal(np.asarray(want["w"]), np.asarray(got["w"]))
        np.testing.assert_array_equal(
            np.asarray(s1.mu["w"]), np.asarray(s1b.mu["w"])
        )
        assert s1b.mu["w"].dtype == (mdt or jnp.float32)


def test_resolve_fused_adam_validation():
    assert common.resolve_fused_adam("off") == "off"
    assert common.resolve_fused_adam("auto") in ("off", "pallas")
    with pytest.raises(ValueError):
        common.resolve_fused_adam("bogus")


def test_step_with_interpret_fused_matches_off():
    """Full SNDCGAN train step: fused_adam='interpret' vs 'off' — step-1
    metrics are computed from PRE-apply parameters so they must be
    bit-exact; post-apply state agrees to FMA-contraction ulp on the fused
    leaves (the stem Dense rides the Pallas path; everything else falls
    back and stays bitwise-identical by construction)."""
    from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
    from imagegeneration_tpu.train.sndcgan_step import (
        SNDCGANTrainConfig,
        init_state,
        make_train_step,
    )

    results = {}
    for mode in ("off", "interpret"):
        cfg = SNDCGANTrainConfig(
            model=SNDCGANConfig(image_size=(48, 80, 3), dropout_rate=0.0),
            batch_size=2,
            seed=7,
            fused_adam=mode,
        )
        state = init_state(cfg)
        # the full-width stem Dense (128 x 30720 = 3.93M) is fused-eligible
        assert any(
            leaf_eligible(x, x) for x in jax.tree.leaves(state.g_params)
        )
        batch = np.random.default_rng(0).integers(
            0, 256, (2, 48, 80, 3), np.uint8
        )
        state, metrics = jax.jit(make_train_step(cfg))(state, batch)
        results[mode] = (state, metrics)

    s_off, m_off = results["off"]
    s_int, m_int = results["interpret"]
    for k in m_off:
        np.testing.assert_array_equal(np.asarray(m_off[k]), np.asarray(m_int[k]), err_msg=k)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path((s_off.g_params, s_off.d_params, s_off.g_opt, s_off.d_opt)),
        jax.tree_util.tree_leaves_with_path((s_int.g_params, s_int.d_params, s_int.g_opt, s_int.d_opt)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(pa),
        )
