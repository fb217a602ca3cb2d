"""Mesh/sharding tests on the 8-virtual-device CPU backend.

Under jit-SPMD (unlike pmap), sharding is a partitioning of the SAME math —
a data-parallel step must produce (near-)identical losses and parameters to
the single-device step on the same global batch, with XLA inserting the
cross-device reductions. These tests pin that property, plus the spatial
(H-axis) partitioning path and the driver's dryrun entry points.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imagegeneration_tpu.core.mesh import (
    DATA_AXIS,
    MeshConfig,
    SPATIAL_AXIS,
    batch_sharding,
    make_mesh,
)
from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
from imagegeneration_tpu.parallel.dp import (
    replicate_state,
    shard_paired_train_step,
    shard_train_step,
)
from imagegeneration_tpu.train.sndcgan_step import (
    SNDCGANTrainConfig,
    init_state,
    make_train_step,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

TINY = SNDCGANConfig(image_size=(16, 16, 3), base_width=16, dropout_rate=0.0)


def test_make_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=-1, spatial=2))
    assert mesh.shape[DATA_AXIS] == 4 and mesh.shape[SPATIAL_AXIS] == 2
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data=3, spatial=2))


def _run(cfg, batch, mesh=None, spatial=False, steps=2):
    step_fn = make_train_step(cfg, mesh=mesh)
    state = init_state(cfg)
    if mesh is None:
        step = jax.jit(step_fn)
    else:
        step = shard_train_step(step_fn, mesh, spatial=spatial, donate_state=False)
        state = replicate_state(state, mesh)
        batch = jax.device_put(batch, batch_sharding(mesh, spatial))
    metrics = None
    for _ in range(steps):
        state, metrics = step(state, batch)
    return state, metrics


def test_data_parallel_matches_single_device():
    cfg = SNDCGANTrainConfig(model=TINY, batch_size=8, seed=7)
    batch = np.random.default_rng(0).integers(0, 256, (8, 16, 16, 3), np.uint8)

    s_single, m_single = _run(cfg, batch, mesh=None)
    mesh = make_mesh(MeshConfig(data=8, spatial=1))
    s_dp, m_dp = _run(cfg, batch, mesh=mesh)

    for k in m_single:
        assert float(m_single[k]) == pytest.approx(float(m_dp[k]), rel=2e-3, abs=2e-4)
    a = np.asarray(s_single.g_params["stem"]["Dense_0"]["kernel"])
    b = np.asarray(s_dp.g_params["stem"]["Dense_0"]["kernel"])
    assert np.mean(np.abs(a - b)) < 1e-5


def test_spatial_partitioning_matches_single_device():
    """One step must match tightly (the partitioner-bug regression check:
    without the in-step replication constraint the d_loss_fake branch
    diverged by >2x here). Multi-step runs drift via Adam's near-zero-grad
    sign sensitivity, same as the scan-vs-stream case, so step 1 is the
    exactness point."""
    cfg = SNDCGANTrainConfig(model=TINY, batch_size=4, seed=7)
    batch = np.random.default_rng(1).integers(0, 256, (4, 16, 16, 3), np.uint8)

    s_single, m_single = _run(cfg, batch, mesh=None, steps=1)
    mesh = make_mesh(MeshConfig(data=4, spatial=2))  # N/4 x H/2
    s_sp, m_sp = _run(cfg, batch, mesh=mesh, spatial=True, steps=1)

    for k in m_single:
        assert float(m_single[k]) == pytest.approx(float(m_sp[k]), rel=2e-4, abs=2e-5)


def test_spatial_partitioning_config5_aspect_matches_single_device():
    """Always-on pin for the config-5 program CLASS (VERDICT r4 #4): the
    512x288 exactness gate (tests/test_config5.py) is IMAGEGEN_CONFIG5-
    gated because full-shape XLA:CPU compiles take ~14 min each, so after
    the round-4 gradient-replication fix the program class it pins went a
    round without suite coverage. This test pins the same structure every
    run — spatial H-sharding of the SN-DCGAN step at a config-5-like
    non-square aspect (64x128, H/8 maps at 4 rows/shard: safely above the
    degenerate-halo boundary) on the 4x2 data x spatial mesh."""
    cfg = SNDCGANTrainConfig(
        model=SNDCGANConfig(
            image_size=(64, 128, 3), base_width=32, dropout_rate=0.0
        ),
        batch_size=4,
        seed=7,
    )
    batch = np.random.default_rng(5).integers(0, 256, (4, 64, 128, 3), np.uint8)

    s_single, m_single = _run(cfg, batch, mesh=None, steps=1)
    mesh = make_mesh(MeshConfig(data=4, spatial=2))
    s_sp, m_sp = _run(cfg, batch, mesh=mesh, spatial=True, steps=1)

    for k in m_single:
        assert float(m_single[k]) == pytest.approx(
            float(m_sp[k]), rel=2e-4, abs=2e-5
        ), k
    a = np.asarray(s_single.g_params["stem"]["Dense_0"]["kernel"])
    b = np.asarray(s_sp.g_params["stem"]["Dense_0"]["kernel"])
    assert np.max(np.abs(a - b)) < 1e-5
    assert s_sp.d_params["conv0"]["Conv_0"]["kernel"].sharding.is_fully_replicated


def test_replicated_state_stays_in_sync():
    """After sharded steps the state sharding is still fully replicated."""
    cfg = SNDCGANTrainConfig(model=TINY, batch_size=8)
    batch = np.random.default_rng(2).integers(0, 256, (8, 16, 16, 3), np.uint8)
    mesh = make_mesh(MeshConfig(data=8))
    state, _ = _run(cfg, batch, mesh=mesh, steps=1)
    kernel = state.g_params["stem"]["Dense_0"]["kernel"]
    assert kernel.sharding.is_fully_replicated


def test_resident_epoch_runner_under_mesh_matches_single_device():
    """The lax.scan whole-epoch runner (the zero-host-involvement fast path)
    must compose with the mesh: replicated HBM dataset, per-iteration batch
    resharded to the data axis, metrics matching the single-device scan."""
    from imagegeneration_tpu.train.sndcgan_step import make_epoch_runner

    cfg = SNDCGANTrainConfig(model=TINY, batch_size=8, seed=7)
    rng = np.random.default_rng(3)
    images = rng.integers(0, 256, (16, 16, 16, 3), np.uint8)
    perm = rng.permutation(16).reshape(2, 8)

    run_single = jax.jit(make_epoch_runner(cfg))
    s1, m1 = run_single(init_state(cfg), jnp.asarray(images), jnp.asarray(perm))

    mesh = make_mesh(MeshConfig(data=8, spatial=1))
    repl = NamedSharding(mesh, P())
    run_mesh = jax.jit(
        make_epoch_runner(cfg, mesh=mesh),
        in_shardings=(repl, repl, repl),
        out_shardings=(repl, repl),
    )
    state0 = replicate_state(init_state(cfg), mesh)
    s8, m8 = run_mesh(
        state0,
        jax.device_put(images, repl),
        jax.device_put(perm, repl),
    )

    for k in m1:
        np.testing.assert_allclose(
            np.asarray(m1[k]), np.asarray(m8[k]), rtol=2e-3, atol=2e-4,
            err_msg=f"metric {k}",
        )
    a = np.asarray(s1.g_params["stem"]["Dense_0"]["kernel"])
    b = np.asarray(s8.g_params["stem"]["Dense_0"]["kernel"])
    assert np.mean(np.abs(a - b)) < 1e-5
    assert s8.g_params["stem"]["Dense_0"]["kernel"].sharding.is_fully_replicated


def test_wgan_resident_epoch_runner_under_mesh():
    """Step 1 must match tightly — that is the SPMD-correctness pin: the
    partitioned program is the same math, so any step-1 metric divergence
    is a partitioner bug (like the one make_replicator works around).

    Steps >= 2 are NOT compared numerically, by measured rationale
    (benchmarks/diag_mesh_drift.py): near-cancelling gradient sums get
    their SIGN from fp reduction order, and RMSprop's first-step update is
    ~lr*sign(g)/sqrt(1-rho) regardless of |g| — isolated full-magnitude
    (3.16e-4) weight flips then decohere the two equally-valid trajectories
    chaotically (2.4e-2 relative metric drift by step 2 at this config).
    Later steps are checked for finiteness and identical gan-update cadence
    (cadence is integer-exact and must survive sharding)."""
    from imagegeneration_tpu.models.wgan import WGANConfig
    from imagegeneration_tpu.parallel.dp import jit_epoch_runner
    from imagegeneration_tpu.train.wgan_step import (
        WGANTrainConfig,
        init_state as wgan_init,
        make_epoch_runner as wgan_runner,
    )

    cfg = WGANTrainConfig(
        model=WGANConfig(image_size=(16, 16, 3), base_width=16),
        batch_size=8, n_critic=2, seed=7,
    )
    rng = np.random.default_rng(5)
    images = rng.integers(0, 256, (16, 16, 16, 3), np.uint8)
    perm = rng.permutation(16).reshape(2, 8)

    s1, m1 = jit_epoch_runner(wgan_runner(cfg), None, 2)(
        wgan_init(cfg), jnp.asarray(images), jnp.asarray(perm)
    )
    mesh = make_mesh(MeshConfig(data=8, spatial=1))
    s8, m8 = jit_epoch_runner(wgan_runner(cfg, mesh=mesh), mesh, 2)(
        replicate_state(wgan_init(cfg), mesh),
        replicate_state(images, mesh),
        replicate_state(perm, mesh),
    )
    for k in m1:
        np.testing.assert_allclose(
            np.asarray(m1[k])[0], np.asarray(m8[k])[0], rtol=1e-4, atol=1e-5,
            err_msg=f"step-1 metric {k}",
        )
        assert np.all(np.isfinite(np.asarray(m8[k])))
    np.testing.assert_array_equal(  # n_critic cadence is sharding-invariant
        np.asarray(m1["did_gan_update"]), np.asarray(m8["did_gan_update"])
    )
    kernel = jax.tree.leaves(s8.c_params)[0]
    assert kernel.sharding.is_fully_replicated


def test_cyclegan_resident_epoch_runner_under_mesh():
    """Step-1 exactness pin + finiteness for later steps, same measured
    rationale as the WGAN flavor (benchmarks/diag_mesh_drift.py): the exact
    Keras-form Adam's near-zero-gradient updates are ~alpha*sign(g), so fp
    reduction-order sign flips decohere multi-step trajectories. 96x96 is
    the smallest size the reference PatchGAN's VALID 4x4 stack accepts
    (models/cyclegan.py input guard; the previous 16x16 config could never
    build the discriminator — VERDICT r2 weak #1)."""
    from imagegeneration_tpu.models.cyclegan import CycleGANConfig
    from imagegeneration_tpu.parallel.dp import jit_epoch_runner
    from imagegeneration_tpu.train.cyclegan_step import (
        CycleGANTrainConfig,
        init_state as cyc_init,
        make_epoch_runner as cyc_runner,
    )

    cfg = CycleGANTrainConfig(
        model=CycleGANConfig(
            image_size=(96, 96, 3), base_width=8, n_res_blocks=1,
            in_backend="xla",
        ),
        batch_size=8, seed=7,
    )
    rng = np.random.default_rng(6)
    ix = rng.integers(0, 256, (16, 96, 96, 3), np.uint8)
    iy = rng.integers(0, 256, (16, 96, 96, 3), np.uint8)
    px = rng.permutation(16).reshape(2, 8)
    py = rng.permutation(16).reshape(2, 8)

    s1, m1 = jit_epoch_runner(cyc_runner(cfg), None, 4)(
        cyc_init(cfg), jnp.asarray(ix), jnp.asarray(iy),
        jnp.asarray(px), jnp.asarray(py),
    )
    mesh = make_mesh(MeshConfig(data=8, spatial=1))
    r = lambda x: replicate_state(x, mesh)  # noqa: E731
    s8, m8 = jit_epoch_runner(cyc_runner(cfg, mesh=mesh), mesh, 4)(
        r(cyc_init(cfg)), r(ix), r(iy), r(px), r(py)
    )
    for k in m1:
        np.testing.assert_allclose(
            np.asarray(m1[k])[0], np.asarray(m8[k])[0], rtol=1e-4, atol=1e-5,
            err_msg=f"step-1 metric {k}",
        )
        assert np.all(np.isfinite(np.asarray(m8[k])))
    kernel = jax.tree.leaves(s8.gg_params)[0]
    assert kernel.sharding.is_fully_replicated


def test_wgan_spatial_partitioning_matches_single_device():
    """Step-1 exactness for WGAN under the data x spatial (H-sharded) mesh —
    the critic's strided SAME convs force XLA halo exchanges on the H axis,
    and the in-graph clip/cadence must survive the partitioning. Same
    step-1-is-the-exactness-point rationale as the SNDCGAN spatial test.

    32x32 keeps the deepest critic feature map at 4x4 (2 rows per spatial
    shard, >= the 3x3 kernel halo). At 16x16 the deepest map is 2x2 and the
    per-shard extent collapses to 1 row < halo — a degenerate partitioning
    where GSPMD's halo/reduction resolution is measurably WRONG (isolated f64
    forward loss differs 0.3%, conv grads come out exactly 1/(data axis)x;
    see docs/STATUS.md round 4). Spatial sharding targets large images
    (config-5 512x288); tests must stay out of the degenerate regime."""
    from imagegeneration_tpu.models.wgan import WGANConfig
    from imagegeneration_tpu.train.wgan_step import (
        WGANTrainConfig,
        init_state as wgan_init,
        make_train_step as wgan_step,
    )

    cfg = WGANTrainConfig(
        model=WGANConfig(image_size=(32, 32, 3), base_width=16),
        batch_size=4, n_critic=2, seed=7,
    )
    batch = np.random.default_rng(8).integers(0, 256, (4, 32, 32, 3), np.uint8)

    s_single = wgan_init(cfg)
    s_single, m_single = jax.jit(wgan_step(cfg))(s_single, batch)

    mesh = make_mesh(MeshConfig(data=4, spatial=2))
    step = shard_train_step(
        wgan_step(cfg, mesh=mesh), mesh, spatial=True, donate_state=False
    )
    s_sp = replicate_state(wgan_init(cfg), mesh)
    s_sp, m_sp = step(
        s_sp, jax.device_put(batch, batch_sharding(mesh, spatial=True))
    )

    for k in m_single:
        assert float(m_single[k]) == pytest.approx(
            float(m_sp[k]), rel=2e-4, abs=2e-5
        ), k
    kernel = jax.tree.leaves(s_sp.c_params)[0]
    assert kernel.sharding.is_fully_replicated


def test_cyclegan_spatial_partitioning_matches_single_device():
    """Step-1 exactness for CycleGAN under the data x spatial mesh: the
    ReflectionPad + VALID PatchGAN stack and InstanceNorm's per-image spatial
    reductions must partition exactly (IN reduces over the sharded H axis —
    XLA must insert the cross-shard reduction)."""
    from imagegeneration_tpu.models.cyclegan import CycleGANConfig
    from imagegeneration_tpu.train.cyclegan_step import (
        CycleGANTrainConfig,
        init_state as cyc_init,
        make_train_step as cyc_step,
    )

    cfg = CycleGANTrainConfig(
        model=CycleGANConfig(
            image_size=(96, 96, 3), base_width=8, n_res_blocks=1,
            in_backend="xla",
        ),
        batch_size=4, seed=7,
    )
    rng = np.random.default_rng(9)
    bx = rng.integers(0, 256, (4, 96, 96, 3), np.uint8)
    by = rng.integers(0, 256, (4, 96, 96, 3), np.uint8)

    s_single = cyc_init(cfg)
    s_single, m_single = jax.jit(cyc_step(cfg))(s_single, bx, by)

    mesh = make_mesh(MeshConfig(data=4, spatial=2))
    step = shard_paired_train_step(
        cyc_step(cfg, mesh=mesh), mesh, spatial=True, donate_state=False
    )
    sh = batch_sharding(mesh, spatial=True)
    s_sp = replicate_state(cyc_init(cfg), mesh)
    s_sp, m_sp = step(s_sp, jax.device_put(bx, sh), jax.device_put(by, sh))

    for k in m_single:
        assert float(m_single[k]) == pytest.approx(
            float(m_sp[k]), rel=2e-4, abs=2e-5
        ), k
    kernel = jax.tree.leaves(s_sp.gg_params)[0]
    assert kernel.sharding.is_fully_replicated


def _f64_multistep_drift(make_cfg, init_fn, step_fn_factory, make_batches,
                         n_steps=4):
    """Shared driver for the f64 multi-step mesh-equivalence tests.

    Rationale (benchmarks/diag_mesh_drift.py): in f32, near-cancelling
    gradient sums get their SIGN from fp reduction order, and the optimizers'
    first-step update is ~lr*sign(g) regardless of |g| — so f32 multi-step
    single-vs-mesh comparison is chaotic by construction, not by bug. In f64
    the reduction-order noise (~1e-16 relative) is ~9 orders below any
    realistic gradient magnitude, so sign flips vanish and the two
    trajectories must agree QUANTITATIVELY over multiple steps. This turns
    the finiteness-only multi-step check into a numeric invariant: any real
    SPMD divergence (wrong collective, halo bug, state desync) accumulates
    and fails here, while legit fp-order noise stays ~1e-12.

    Besides per-step metrics, the FINAL STATE (params, batch stats, optimizer
    accumulators) is compared leaf-by-leaf. This is the sharper invariant:
    RMSprop/Adam are scale-invariant in the gradient, so a wrong-by-a-
    constant-factor gradient (the GSPMD psum-for-pmean miscompile this caught
    in the WGAN critic update — nu exactly (data axis)^2 x too large) leaves
    losses and even params nearly unchanged while the second-moment state is
    wildly wrong. Metrics-only trajectory tests are blind to that class.
    """
    old_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = make_cfg()
        batches = make_batches()

        s1 = init_fn(cfg)
        step1 = jax.jit(step_fn_factory(cfg, None))
        traj1 = []
        for b in batches[:n_steps]:
            s1, m1 = step1(s1, *b)
            traj1.append({k: float(v) for k, v in m1.items()})

        mesh = make_mesh(MeshConfig(data=4, spatial=2))
        sh = batch_sharding(mesh, spatial=True)
        repl = NamedSharding(mesh, P())
        stepm = jax.jit(
            step_fn_factory(cfg, mesh),
            in_shardings=(repl,) + (sh,) * len(batches[0]),
            out_shardings=(repl, repl),
        )
        sm = replicate_state(init_fn(cfg), mesh)
        trajm = []
        for b in batches[:n_steps]:
            sm, mm = stepm(sm, *(jax.device_put(x, sh) for x in b))
            trajm.append({k: float(v) for k, v in mm.items()})

        for i, (m1, mm) in enumerate(zip(traj1, trajm)):
            for k in m1:
                assert m1[k] == pytest.approx(mm[k], rel=1e-9, abs=1e-10), (
                    f"step {i + 1} metric {k}: single={m1[k]} mesh={mm[k]}"
                )

        # Final-state comparison — catches optimizer-scale bugs metrics miss.
        # abs floor 1e-8: coordinates whose true gradient is EXACTLY zero by
        # cancellation (conv bias feeding BatchNorm) carry reduction-order
        # noise ~1e-16 that optimizer state squares/accumulates; they sit many
        # orders below 1e-8 while any real factor-of-axis-size bug sits many
        # orders above.
        flat1 = jax.tree_util.tree_flatten_with_path(s1)[0]
        flatm = jax.tree_util.tree_flatten_with_path(sm)[0]
        assert len(flat1) == len(flatm)
        for (path, a1), (_, am) in zip(flat1, flatm):
            a1 = np.asarray(a1)
            am = np.asarray(am)
            if a1.dtype == bool or a1.size == 0:
                continue
            d = float(np.abs(a1.astype(np.float64) - am.astype(np.float64)).max())
            tol = max(1e-8, 1e-6 * float(np.abs(a1).max()))
            assert d <= tol, (
                f"state leaf {jax.tree_util.keystr(path)}: "
                f"max abs diff {d:.3e} > tol {tol:.3e}"
            )
    finally:
        jax.config.update("jax_enable_x64", old_x64)


def test_wgan_multistep_mesh_equivalence_f64():
    """4-step numeric single-vs-mesh agreement for the WGAN step (both
    cadence branches fire at n_critic=2) under the data x spatial mesh.
    32x32, not 16x16 — see test_wgan_spatial_partitioning docstring for the
    degenerate-shard-extent regime this must stay out of."""
    from imagegeneration_tpu.models.wgan import WGANConfig
    from imagegeneration_tpu.train.wgan_step import (
        WGANTrainConfig,
        init_state as wgan_init,
        make_train_step as wgan_step,
    )

    def make_cfg():
        return WGANTrainConfig(
            model=WGANConfig(
                image_size=(32, 32, 3), base_width=16, dtype=jnp.float64
            ),
            batch_size=4, n_critic=2, seed=7,
        )

    def make_batches():
        rng = np.random.default_rng(11)
        return [
            (rng.integers(0, 256, (4, 32, 32, 3), np.uint8),)
            for _ in range(4)
        ]

    _f64_multistep_drift(
        make_cfg, wgan_init, lambda c, m: wgan_step(c, mesh=m), make_batches
    )


def test_sndcgan_multistep_mesh_equivalence_f64():
    """4-step numeric single-vs-mesh agreement for the SNDCGAN step (G
    update + two-apply D update) under the data x spatial mesh. The final-
    state comparison is what caught the GSPMD sum-for-mean gradient
    miscompile: Adam's mu/nu were exactly 4x/16x inflated on the mesh while
    losses matched (scale-invariance)."""

    def make_cfg():
        return SNDCGANTrainConfig(
            model=SNDCGANConfig(
                image_size=(32, 32, 3), base_width=16, dropout_rate=0.0,
                dtype=jnp.float64,
            ),
            batch_size=4, seed=7,
        )

    def make_batches():
        rng = np.random.default_rng(13)
        return [
            (rng.integers(0, 256, (4, 32, 32, 3), np.uint8),)
            for _ in range(4)
        ]

    _f64_multistep_drift(
        make_cfg, init_state, lambda c, m: make_train_step(c, mesh=m),
        make_batches,
    )


def test_cyclegan_multistep_mesh_equivalence_f64():
    """4-step numeric single-vs-mesh agreement for the CycleGAN fused
    4-network step under the data x spatial mesh."""
    from imagegeneration_tpu.models.cyclegan import CycleGANConfig
    from imagegeneration_tpu.train.cyclegan_step import (
        CycleGANTrainConfig,
        init_state as cyc_init,
        make_train_step as cyc_step,
    )

    def make_cfg():
        return CycleGANTrainConfig(
            model=CycleGANConfig(
                image_size=(96, 96, 3), base_width=8, n_res_blocks=1,
                in_backend="xla", dtype=jnp.float64,
            ),
            batch_size=4, seed=7,
        )

    def make_batches():
        rng = np.random.default_rng(12)
        return [
            (
                rng.integers(0, 256, (4, 96, 96, 3), np.uint8),
                rng.integers(0, 256, (4, 96, 96, 3), np.uint8),
            )
            for _ in range(4)
        ]

    _f64_multistep_drift(
        make_cfg, cyc_init, lambda c, m: cyc_step(c, mesh=m), make_batches
    )


def test_graft_entry_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, (state, batch) = ge.entry()
    # compile-check only (tiny eval_shape avoids the heavy full-size compile)
    out_shape = jax.eval_shape(fn, state, batch)
    assert out_shape is not None


def test_degenerate_spatial_regime_refused(tmp_path, monkeypatch):
    """VERDICT r4 #3: the measured-wrong GSPMD regime (per-shard H extent
    below the conv halo — see core/mesh.check_spatial_partition) must be
    REFUSED at engine setup, not silently mis-trained. 16x16 input under
    spatial=2 leaves 1 row/shard on the deepest 4x4-stride-2 feature map
    (16/8/2) — exactly the configuration round 4 measured as wrong."""
    from imagegeneration_tpu.core.data import SyntheticImageDataset
    from imagegeneration_tpu.core.mesh import check_spatial_partition
    from imagegeneration_tpu.train.wgan_engine import WGANEngine
    from imagegeneration_tpu.train.sndcgan_engine import SNDCGANEngine

    mesh = make_mesh(MeshConfig(data=4, spatial=2))
    ds = SyntheticImageDataset(8, (16, 16), seed=3)
    with pytest.raises(ValueError, match="WRONG below 2"):
        WGANEngine(
            dataset=ds, image_size=(16, 16, 3), batch_size=8,
            path_like=str(tmp_path / "w"), mesh=mesh, spatial=True,
        )
    with pytest.raises(ValueError, match="WRONG below 2"):
        SNDCGANEngine(
            dir_path=str(tmp_path / "s"), dataset=ds, batch_size=8,
            image_size=(16, 16, 3), base_width=64, mesh=mesh, spatial=True,
        )

    # 32x32 keeps 2 rows/shard everywhere — the measured bit-exact boundary.
    check_spatial_partition(32 // 8, 2, "wgan", 32)
    # Uneven splits are refused too (the remainder shard is short).
    with pytest.raises(ValueError):
        check_spatial_partition(9, 2, "sndcgan", 72)

    # Escape hatch downgrades to a warning (miscompile repro harnesses).
    monkeypatch.setenv("IMAGEGEN_ALLOW_DEGENERATE_SPATIAL", "1")
    with pytest.warns(RuntimeWarning, match="WRONG below 2"):
        check_spatial_partition(2, 2, "wgan", 16)
