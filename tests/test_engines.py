"""End-to-end engine smoke tests (tiny models, CPU): train -> artifacts ->
resume. The CPU analogue of the reference's 'run the Trainer and look at the
outputs' workflow (SURVEY.md §4)."""

import os
import pickle

import numpy as np
import pytest

from imagegeneration_tpu.core.data import SyntheticImageDataset


@pytest.fixture(scope="module")
def tiny_ds():
    return SyntheticImageDataset(12, (16, 16), seed=0)


def test_sndcgan_engine_train_resume(tmp_path, tiny_ds):
    from imagegeneration_tpu.train.sndcgan_engine import SNDCGANEngine

    out = tmp_path / "train"
    live = str(tmp_path / "live")
    kwargs = dict(
        batch_size=4,
        dropout=0.1,
        live_output=live,
        image_size=(16, 16, 3),
        z_size=8,
        base_width=16,
    )
    eng = SNDCGANEngine(str(out), tiny_ds, continue_=False, **kwargs)
    eng.train(2, checkpoint_frequency=1)

    assert (out / "losses.pickle").exists()
    with open(out / "losses.pickle", "rb") as f:
        losses = pickle.load(f)
    assert losses["epoch"] == [0, 1]
    assert len(losses["avg_g_loss"]) == 2
    assert (out / "models" / "generator" / "gen_model-1.msgpack").exists()
    assert (out / "plot_line_plot_loss.png").exists()
    assert os.path.exists(live + ".pdf")
    eng.ckpt_manager.close()

    # resume continues from epoch 2
    eng2 = SNDCGANEngine(str(out), tiny_ds, continue_=True, **kwargs)
    assert eng2.start_epoch == 2
    eng2.train(3, checkpoint_frequency=1)
    with open(out / "losses.pickle", "rb") as f:
        losses = pickle.load(f)
    assert losses["epoch"] == [0, 1, 2]
    eng2.ckpt_manager.close()


def test_wgan_engine_train_and_history(tmp_path, tiny_ds):
    from imagegeneration_tpu.train.wgan_engine import WGANEngine

    out = str(tmp_path / "wgan")
    eng = WGANEngine(
        tiny_ds, (16, 16, 3), 4,
        critic_learn_iterations=2,
        path_like=out,
        save_interval=1,
        base_width=16,
    )
    eng.train(2)
    # 3 batches/epoch, n_critic=2 -> gan updates at batches 2,4,6 (cross-epoch
    # carry): 1 in epoch 1, 2 in epoch 2
    with open(os.path.join(out, "stats.pickle"), "rb") as f:
        hist = pickle.load(f)
    assert len(hist["g_hist"]) == 3
    assert len(hist["c1_hist"]) == len(hist["c2_hist"]) == 3
    assert os.path.exists(os.path.join(out, "samples", "generated_plot_0002.jpg"))
    assert os.path.exists(os.path.join(out, "g_models", "model_0002.msgpack"))
    assert os.path.exists(os.path.join(out, f"plot_line_plot_loss_2.png"))
    eng.ckpt_manager.close()


def test_sndcgan_engine_data_parallel(tmp_path, tiny_ds):
    """Engine-level DP integration on the 8-virtual-device mesh (streaming
    path: shard_batch + sharded step + replicated state through artifacts)."""
    import jax
    import pytest as _pytest

    if jax.device_count() < 8:
        _pytest.skip("needs 8 virtual devices")
    from imagegeneration_tpu.core.mesh import MeshConfig, make_mesh
    from imagegeneration_tpu.train.sndcgan_engine import SNDCGANEngine

    mesh = make_mesh(MeshConfig(data=-1, spatial=1))  # all 8 devices
    out = tmp_path / "dp"
    eng = SNDCGANEngine(
        str(out), tiny_ds, batch_size=8, dropout=0.0,
        live_output=str(tmp_path / "live_dp"), image_size=(16, 16, 3),
        z_size=8, base_width=16, mesh=mesh,
    )
    # Since round 2's sharded-resident epochs, a mesh no longer forces the
    # streaming path: a small dataset stays device-resident with the scan
    # runner composed over the mesh (train/sndcgan_engine.py resident logic).
    assert eng.resident
    eng.train(1, checkpoint_frequency=1)
    assert (out / "losses.pickle").exists()
    kernel = eng.state.g_params["stem"]["Dense_0"]["kernel"]
    assert kernel.sharding.is_fully_replicated
    eng.ckpt_manager.close()


def test_sndcgan_engine_spatial_partitioning(tmp_path):
    """Engine-level data x spatial integration (the config-5 axis, now
    reachable via the engine/CLI `spatial` knob instead of only the step
    API). 32x32 input: every per-shard feature-map extent stays >= the 3x3
    halo at spatial=2 (the 16x16 degenerate regime is documented in
    tests/test_parallel.py round 4). Numeric step-1 exactness is pinned in
    test_parallel; this covers the engine wiring: spatial batch sharding on
    both streaming and resident paths, replicated state, artifacts."""
    import jax
    import pytest as _pytest

    if jax.device_count() < 8:
        _pytest.skip("needs 8 virtual devices")
    from imagegeneration_tpu.core.mesh import MeshConfig, make_mesh
    from imagegeneration_tpu.train.sndcgan_engine import SNDCGANEngine

    mesh = make_mesh(MeshConfig(data=4, spatial=2))
    ds = SyntheticImageDataset(8, (32, 32), seed=3)
    out = tmp_path / "sp"
    eng = SNDCGANEngine(
        str(out), ds, batch_size=4, dropout=0.0,
        live_output=str(tmp_path / "live_sp"), image_size=(32, 32, 3),
        z_size=8, base_width=16, mesh=mesh, spatial=True,
    )
    assert eng.spatial and eng.resident
    eng.train(1, checkpoint_frequency=1)
    assert (out / "losses.pickle").exists()
    kernel = eng.state.g_params["stem"]["Dense_0"]["kernel"]
    assert kernel.sharding.is_fully_replicated
    eng.ckpt_manager.close()

    # Streaming path takes the spatially-sharded shard_batch branch.
    eng2 = SNDCGANEngine(
        str(tmp_path / "sp_stream"), ds, batch_size=4, dropout=0.0,
        live_output=str(tmp_path / "live_sp2"), image_size=(32, 32, 3),
        z_size=8, base_width=16, mesh=mesh, spatial=True, resident=False,
    )
    eng2.train(1, checkpoint_frequency=1)
    assert np.isfinite(eng2.losses.data["avg_g_loss"][-1])
    eng2.ckpt_manager.close()


def test_cyclegan_engine_train_and_autoresume(tmp_path):
    from imagegeneration_tpu.train.cyclegan_engine import CycleGANEngine

    ds_x = SyntheticImageDataset(6, (96, 96), seed=1)
    ds_y = SyntheticImageDataset(6, (96, 96), seed=2)
    out = str(tmp_path / "cyc")
    kwargs = dict(base_width=8, n_res_blocks=1)
    eng = CycleGANEngine(ds_x, ds_y, out, 2, (96, 96), **kwargs)
    eng.train(1, checkpoint_frequency=1)
    with open(os.path.join(out, "losses.pickle"), "rb") as f:
        losses = pickle.load(f)
    assert len(losses["total_cycle_loss"]) == 1
    assert os.path.exists(
        os.path.join(out, "models", "generator_g", "gen_weights_g-0.msgpack")
    )
    assert os.path.exists(os.path.join(out, "preview.pdf"))
    eng.ckpt_manager.close()

    # unconditional auto-resume (reference CycleGAN.py:263-269)
    eng2 = CycleGANEngine(ds_x, ds_y, out, 2, (96, 96), **kwargs)
    assert eng2.epoch == 1
    eng2.ckpt_manager.close()
