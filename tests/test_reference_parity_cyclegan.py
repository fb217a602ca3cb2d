"""CycleGAN cross-framework parity vs the REFERENCE CODE EXECUTED AS-IS.

tests/_reference_worker_cyclegan.py injects a minimal tfa shim
(InstanceNormalization == GroupNormalization(groups=-1), the exact identity
tfa implements) and runs /root/reference/cyclegan/CycleGAN.py's real
@tf.function train_step (CycleGAN.py:325-382) for 3 steps on fixed batches —
the persistent-tape 4-simultaneous-update step this repo reproduces with one
shared forward + 3 vjp pulls (train/cyclegan_step.py). The axis=1
InstanceNorm quirk is exercised end-to-end: the reference's per-H gamma/beta
artifacts import into quirk_axis1=True models.

Asserted: initial forward outputs of both generators from imported weights,
the 7 reported loss trajectories over 3 steps, and post-step weights of all
FOUR networks (covering the exact Keras-form Adam with beta1=0.5 and the
per-loss gradient extraction)."""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REF_ROOT = "/root/reference"
STEPS = 3
KEYS = ("gen_g_loss", "gen_f_loss", "identity_loss_g", "identity_loss_f",
        "total_gen_g_loss", "total_gen_f_loss", "total_cycle_loss")


@pytest.fixture(scope="session")
def cyc_artifacts(tmp_path_factory):
    if not os.path.isdir(os.path.join(REF_ROOT, "cyclegan")):
        pytest.skip("reference checkout not available")
    out = tmp_path_factory.mktemp("refparity_cyc")
    worker = pathlib.Path(__file__).with_name("_reference_worker_cyclegan.py")
    env = dict(
        os.environ,
        TF_USE_LEGACY_KERAS="1",
        TF_CPP_MIN_LOG_LEVEL="2",
        JAX_PLATFORMS="cpu",
    )
    proc = subprocess.run(
        [sys.executable, str(worker), REF_ROOT, str(out)],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, f"worker failed:\n{proc.stderr[-4000:]}"

    ours = pathlib.Path(__file__).with_name("_cyclegan_parity_ours.py")
    out_npz = out / "ours.npz"
    env2 = dict(os.environ, JAX_PLATFORMS="cpu")
    env2.pop("XLA_FLAGS", None)  # helper sets its own (opt level 1)
    proc2 = subprocess.run(
        [sys.executable, str(ours), str(out), str(out_npz)],
        env=env2, capture_output=True, text=True, timeout=2400,
    )
    assert proc2.returncode == 0, f"our-side helper failed:\n{proc2.stderr[-4000:]}"
    return out


def test_cyclegan_initial_forward_parity(cyc_artifacts):
    """Imported reference weights reproduce the reference's own generator
    forwards — pins conv/IN(axis=1 quirk)/ResBlock/ConvT numerics and the
    save_weights import mapping."""
    ref = np.load(cyc_artifacts / "arrays.npz")
    ours = np.load(cyc_artifacts / "ours.npz")
    # tanh-bounded outputs; per-pixel tolerance covers f32 conv
    # reassociation differences across frameworks at 30+ layers depth.
    np.testing.assert_allclose(
        ours["fake_y0"], ref["fake_y0"], atol=5e-4, rtol=0
    )
    np.testing.assert_allclose(
        ours["fake_x0"], ref["fake_x0"], atol=5e-4, rtol=0
    )


def test_cyclegan_trajectory_and_weights_parity(cyc_artifacts):
    ref = np.load(cyc_artifacts / "arrays.npz")
    ours = np.load(cyc_artifacts / "ours.npz")

    for k in KEYS:
        ref_traj = ref[k]
        scale = max(float(np.max(np.abs(ref_traj))), 1e-3)
        np.testing.assert_allclose(
            ours[k], ref_traj, rtol=0, atol=0.02 * scale,
            err_msg=f"loss trajectory {k}",
        )

    # Post-step weights of all four networks. Adam lr=2e-4, 3 applies; a
    # semantic divergence (wrong cotangent, wrong freeze, wrong loss wiring)
    # moves MANY weights by O(lr * steps). fp chaos across frameworks can
    # reach one full sign-flip unit per step on isolated near-zero-gradient
    # coordinates: the exact Keras-form Adam's update is
    # ~lr*sqrt(1-b2^t)/(1-b1^t) * m/(sqrt(v)+eps) ~= 2e-4 * sign(g) when
    # |g| >> eps' — a reduction-order sign flip flips the whole update
    # (measured: 3.5e-4 max residual on one res-block bias, everything else
    # < 3e-4; benchmarks/diag_mesh_drift.py documents the same mechanism).
    # Bound: under 2 sign-flip units (8e-4) max, and the residual must stay
    # rare — bulk of coordinates within 1e-4.
    from imagegeneration_tpu.compat.keras_import import (
        import_cyclegan_discriminator,
        import_cyclegan_generator,
    )
    import jax

    for prefix, importer, fname in (
        ("gg", import_cyclegan_generator, "gg_after.h5"),
        ("gf", import_cyclegan_generator, "gf_after.h5"),
        ("dx", import_cyclegan_discriminator, "dx_after.h5"),
        ("dy", import_cyclegan_discriminator, "dy_after.h5"),
    ):
        ref_params = importer(cyc_artifacts / fname)["params"]
        flat_ref = {
            f"{prefix}:{jax.tree_util.keystr(p)}": np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(ref_params)
        }
        checked = 0
        for key, ref_leaf in flat_ref.items():
            ours_leaf = ours[key]
            resid = np.abs(ours_leaf - ref_leaf)
            assert float(resid.max()) < 8e-4, (
                f"{key}: max residual {float(resid.max()):.2e}"
            )
            # Bulk criterion: sign-flip noise hits isolated coordinates, a
            # semantic divergence moves them en masse. A pure fraction is
            # statistically fragile on tiny leaves (a 128-coord bias allows
            # only 6 flips; binomial noise crosses that). The flip-prone
            # population also varies per WORKER RUN (the executed reference
            # initializes differently every run — diag_parity_flake.py), so
            # the allowance must cover the across-runs tail, not one draw:
            # measured 13/256 (5.1%) on a res-block conv bias in the
            # 2026-08-20 full-suite run 3 after round 3's 5% was set from a
            # single draw. Allow max(10%, 12) — still 10x below the
            # systematic signature (a semantic error moves ~ALL coordinates
            # of the affected leaf, and the max-residual bound above is
            # unchanged).
            n_out = int(np.sum(resid >= 1e-4))
            allowed = max(int(0.10 * resid.size), 12)
            assert n_out <= allowed, (
                f"{key}: {n_out}/{resid.size} coordinates off by >=1e-4 "
                f"(allowed {allowed}) — systematic, not sign-flip noise"
            )
            checked += 1
        assert checked > 10
