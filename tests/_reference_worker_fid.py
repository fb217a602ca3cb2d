"""Subprocess worker: run the reference's FULL train -> FID-evaluation ->
sampling pipeline AS-IS and dump artifacts for the FID/sampling parity tests.

Executes, unmodified, from /root/reference/sndcgan:
  - SNDCGAN.train (SNDCGAN.py:272-335): several real epochs on a synthetic
    image folder, producing the epoch-stamped gen_model-E.h5 /
    disc_model-E.h5 exports and tf Checkpoints exactly as training does;
  - generator_evaluation.evaluate_fid (generator_evaluation.py:107-199):
    init (pin real batches + z), the pop-2 + AvgPool(8,8)+Flatten
    discriminator feature extractor, per-epoch scipy-sqrtm FIDs, pickles,
    plots;
  - generator_output.output_results_models (generator_output.py:51-70) and
    create_samples (:25-28): strided epoch grids from the .h5 exports.

The two scripts hardcode image_size=(144,256,3) as module GLOBALS (they have
no size flag); this worker assigns those globals to the small test size
before calling the functions — configuration, not code modification: every
executed statement is the reference's own. 64x64 keeps the discriminator
trunk at 8x8x512 so the AvgPool(8,8) feature head yields 512-d features and
scipy.linalg.sqrtm stays tractable on this 1-core host.

Outputs in <out_dir>:
  run/models/{generator,discriminator}/*.h5   — reference training exports
  run/evaluation/fid_results.pickle           — reference FID results
  parity.npz — pinned real batches + z, per-epoch FID matrix, epochs list,
               per-epoch create_samples arrays for fixed z, stride-2 epoch
               selection as computed by output_results_models

Usage: python tests/_reference_worker_fid.py <ref_sndcgan_dir> <out_dir>
"""

import os
import sys


def main() -> None:
    ref_dir, out = sys.argv[1], sys.argv[2]
    os.makedirs(out, exist_ok=True)
    sys.path.insert(0, ref_dir)

    import numpy as np
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    # One TF thread => one reduction order (see _reference_worker_cyclegan;
    # thread-pool splits under CPU load flip near-cancelling gradient sums).
    tf.config.threading.set_intra_op_parallelism_threads(1)
    tf.config.threading.set_inter_op_parallelism_threads(1)
    tf.random.set_seed(62)  # the reference's own global seeds (SNDCGAN.py:21-22)
    np.random.seed(87)

    import SNDCGAN as ref
    import generator_evaluation as ge
    import generator_output as go

    H = W = 64
    BATCH = 16
    N_IMAGES = 64  # -> 4 batches per epoch and 4 pinned FID batches
    EPOCHS = 4
    Z = 128

    # size globals (no CLI flag exists for them; see module docstring)
    ge.img_height, ge.img_width, ge.image_size = H, W, (H, W, 3)
    go.image_size = (H, W, 3)

    rng = np.random.default_rng(20260817)
    data_dir = os.path.join(out, "data", "landscape")
    os.makedirs(data_dir, exist_ok=True)
    for i in range(N_IMAGES):
        img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        tf.io.write_file(
            os.path.join(data_dir, f"im{i}.png"), tf.io.encode_png(img)
        )

    run_dir = os.path.join(out, "run")
    gan = ref.SNDCGAN(
        dir_path=run_dir,
        dataset=os.path.join(out, "data"),
        batch_size=BATCH,
        dropout=0.5,
        learning_rate_disc=2e-4,
        learning_rate_gen=2e-4,
        live_output=os.path.join(out, "live"),
        continue_=False,
        image_size=(H, W, 3),
        z_size=Z,
    )
    # Real reference training loop; checkpoint_frequency=1 saves the .h5
    # pair every epoch (SNDCGAN.py:317-333). Trainer.py:37 passes epochs+1.
    gan.train(EPOCHS + 1, 1)

    # ---- reference FID evaluation, executed as-is (fresh init pins batches)
    epochs_used, epoch_fids = ge.evaluate_fid(
        dir_path=run_dir,
        dataset=os.path.join(out, "data"),
        batch_size=BATCH,
        output=run_dir,
        step_size=1,
        start_epoch=1,
        disc_epoch=epochs_used_hint(run_dir),
        continue_=False,
    )

    import pickle

    with open(
        os.path.join(run_dir, "evaluation", "fid_tmp_init.pickle"), "rb"
    ) as f:
        init = pickle.load(f)

    # ---- reference sampling, executed as-is: strided grids from the .h5s
    # (generator_output.py:51-70) and from tf Checkpoints (:73-100, its
    # fixed_z is hardcoded (3, z) so only bSize=3 is consistent — quirk).
    go.output_results_models(9, run_dir, 2, "ref_grid_models", 0)
    # every=1: the ckpt manager keeps max_to_keep=2 checkpoints
    # (SNDCGAN.py:188) and create_plot's axes[i,j] indexing breaks on a
    # single-row figure (generator_output.py:41 — reference quirk), so the
    # stride must leave >= 2 rows.
    go.output_results_ckpts(3, run_dir, 1, "ref_grid_ckpts", 0)

    # per-epoch create_samples arrays on a FIXED z (the exact fn the grids
    # are built from; generator_output.py:63-70 uses one shared z)
    z_fixed = tf.random.uniform((9, Z), minval=-1.0, maxval=1.0, seed=5)
    sample_arrays = {}
    for e in epochs_used:
        m = tf.keras.models.load_model(
            os.path.join(run_dir, "models", "generator", f"gen_model-{e}.h5")
        )
        sample_arrays[f"samples_e{e}"] = go.create_samples(m, z_fixed, 9).numpy()

    np.savez(
        os.path.join(out, "parity.npz"),
        img_real=np.stack([np.asarray(x) for x in init["img_real_used"]]),
        random_z=np.stack([np.asarray(z) for z in init["random_z_used"]]),
        epochs=np.asarray(epochs_used, np.int64),
        epoch_fids=np.asarray(epoch_fids, np.float64),
        disc_epoch=np.asarray(init["disc_epoch"], np.int64),
        z_fixed=z_fixed.numpy(),
        **sample_arrays,
    )
    print("fid reference worker OK", flush=True)


def epochs_used_hint(run_dir: str) -> int:
    """Newest exported discriminator epoch (what a user would pass as
    discEpoch, generator_evaluation.py:251)."""
    import glob
    import ntpath

    files = glob.glob(os.path.join(run_dir, "models", "discriminator", "*.h5"))
    eps = [
        int(ntpath.basename(p).split(".")[-2].replace("disc_model-", ""))
        for p in files
    ]
    return max(eps)


if __name__ == "__main__":
    main()
