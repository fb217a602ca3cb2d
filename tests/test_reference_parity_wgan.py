"""WGAN cross-framework parity vs the REFERENCE CODE EXECUTED AS-IS.

tests/_reference_worker_wgan.py drives the real Keras train_on_batch
primitives of /root/reference/wasserstein_gan/WGAN.py in the train loop's
cadence (2 critic updates per batch, combined-model update every n_critic=2
batches). Here the same 4 batches run through OUR fused jitted step with the
reference's exact latent draws injected, asserting the full critic/generator
loss trajectories and the post-run weights — covering RMSprop, the +-0.01
kernel clip after each critic apply, the predict-mode fake batch, the
frozen-critic-except-BN combined update, and BN moving-stat updates."""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagegeneration_tpu.compat.keras_import import (  # noqa: E402
    import_wgan_critic,
    import_wgan_generator,
)
from imagegeneration_tpu.models.wgan import WGANConfig  # noqa: E402
from imagegeneration_tpu.train.wgan_step import (  # noqa: E402
    WGANTrainConfig,
    init_state,
    make_train_step,
)

REF_ROOT = "/root/reference"
H, W, B, Z = 48, 80, 4, 128
N_CRITIC = 2
BATCHES = 4


@pytest.fixture(scope="session")
def ref_artifacts(tmp_path_factory):
    if not os.path.isdir(os.path.join(REF_ROOT, "wasserstein_gan")):
        pytest.skip("reference checkout not available")
    out = tmp_path_factory.mktemp("refparity_wgan")
    worker = pathlib.Path(__file__).with_name("_reference_worker_wgan.py")
    env = dict(
        os.environ,
        TF_USE_LEGACY_KERAS="1",
        TF_CPP_MIN_LOG_LEVEL="2",
        JAX_PLATFORMS="cpu",
    )
    proc = subprocess.run(
        [sys.executable, str(worker), REF_ROOT, str(out)],
        # 1500 like the CycleGAN worker: ~50 s idle, but under full-host
        # contention (suite + a concurrent chip run's host threads) the
        # single-threaded TF worker has been seen to blow a 560 s budget.
        env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, f"worker failed:\n{proc.stderr[-4000:]}"
    return out


def test_wgan_trajectory_and_weights_parity(ref_artifacts):
    a = np.load(ref_artifacts / "arrays.npz")
    cfg = WGANTrainConfig(
        model=WGANConfig(image_size=(H, W, 3)),
        batch_size=B,
        n_critic=N_CRITIC,
    )
    g = import_wgan_generator(ref_artifacts / "gen_init.h5")
    c = import_wgan_critic(ref_artifacts / "critic_init.h5")
    state = init_state(cfg)
    state = state.replace(
        g_params=g["params"], g_batch_stats=g["batch_stats"],
        c_params=c["params"], c_batch_stats=c["batch_stats"],
    )
    step = jax.jit(make_train_step(cfg))
    batch_u8 = jnp.asarray(a["real_u8"])

    c1, c2, gl = [], [], []
    for i in range(BATCHES):
        state, m = step(
            state, batch_u8,
            jnp.asarray(a["z_fakes"][i]),
            jnp.asarray(a["z_gans"][i // N_CRITIC]),
        )
        c1.append(float(m["c_loss_real"]))
        c2.append(float(m["c_loss_fake"]))
        if float(m["did_gan_update"]) > 0:
            gl.append(float(m["g_loss"]))

    # Step-1 critic-real loss is a pure forward at identical weights.
    np.testing.assert_allclose(c1[0], a["c1_losses"][0], atol=1.5e-4)
    # Trajectories: same fp-chaos rationale as tests/test_reference_parity.py.
    # Wasserstein losses CROSS ZERO while swinging over an O(1) range, so the
    # operative bound is absolute, scaled to the trajectory's own range
    # (observed floor ~0.4% of range by step 4; a semantic error — missing
    # clip, wrong freeze mask, wrong cadence — lands at O(range)).
    # gan-branch losses compound through BOTH the G update and the
    # frozen-critic BN updates and sit at the end of the horizon, so their
    # chaos floor is higher than the critic losses'. The worker pin to one
    # TF thread (round 3) removed the WITHIN-run nondeterminism, but the
    # executed reference initializes differently on EVERY run
    # (benchmarks/diag_parity_flake.py: ~0.19 init delta run to run; its
    # tf/np seeds do not pin Keras init across processes), so each session
    # pins a different trajectory and the late-horizon chaos floor varies
    # across sessions: measured 2.1% of range on one worker draw and 9.5%
    # on another (2026-08-20 full-suite run 3) — RMSprop's ~lr*sign(g)
    # amplification, same mechanism as the SNDCGAN gate's documented flake.
    # Bounds: the FIRST gan update sits before most of the amplification
    # (observed <=0.1% of range) and keeps a tight 3%; later gan updates get
    # the chaos-robust 15% — semantic errors (missing clip, wrong freeze,
    # wrong cadence) land at O(range) ~= 100%.
    for ours, ref, frac in ((c1, a["c1_losses"], 0.02),
                            (c2, a["c2_losses"], 0.02)):
        assert len(ours) == len(ref)
        scale = float(np.max(np.abs(ref)))
        np.testing.assert_allclose(ours, ref, rtol=0, atol=frac * scale)
    g_scale = float(np.max(np.abs(a["g_losses"])))
    assert len(gl) == len(a["g_losses"])
    np.testing.assert_allclose(
        gl[0], a["g_losses"][0], rtol=0, atol=0.03 * g_scale)
    np.testing.assert_allclose(
        gl, a["g_losses"], rtol=0, atol=0.15 * g_scale)

    g_ref = import_wgan_generator(ref_artifacts / "gen_after.h5")["params"]
    c_ref = import_wgan_critic(ref_artifacts / "critic_after.h5")["params"]
    for name, ours, ref in (("gen", state.g_params, g_ref),
                            ("critic", state.c_params, c_ref)):
        flat_ref = {jax.tree_util.keystr(p): v
                    for p, v in jax.tree_util.tree_leaves_with_path(ref)}
        for path, leaf in jax.tree_util.tree_leaves_with_path(ours):
            key = jax.tree_util.keystr(path)
            residual = np.abs(np.asarray(leaf) - flat_ref[key])
            # RMSprop lr=5e-5, <=8 applies; sign-flip bound ~2*lr*applies.
            assert float(np.max(residual)) < 8e-4, (
                f"{name}{key}: max residual {np.max(residual):.2e}"
            )
    # The critic's clipped CONV kernels must sit inside the +-0.01 hypercube
    # (the Dense head carries no constraint — WGAN.py:96).
    for i in range(7):
        k = state.c_params[f"conv{i}"]["Conv_0"]["kernel"]
        assert float(jnp.max(jnp.abs(k))) <= 0.01 + 1e-7
