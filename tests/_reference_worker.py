"""Subprocess worker: execute the ACTUAL reference code and dump artifacts.

Run with TF_USE_LEGACY_KERAS=1 (the reference is TF2/Keras-2 era code; Keras 3
rejects its np.int64 Dense units). Imports /root/reference/sndcgan/SNDCGAN.py
as-is via sys.path, builds its real models, instantiates its real training
class, runs its real eager `train_step` (SNDCGAN.py:241-269) on fixed inputs,
and writes everything tests need to a directory:

  gen_init.h5 / disc_init.h5   — initial weights (full-model h5 saves)
  arrays.npz                   — fixed inputs, forward outputs, and the
                                 3-step loss/logit trajectory
  gen_after.h5 / disc_after.h5 — weights after 3 reference train steps

Usage: python tests/_reference_worker.py <ref_sndcgan_dir> <out_dir>
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
    import SNDCGAN as ref  # the reference module, executed as-is

    H, W = 48, 80
    BATCH = 4
    Z = 128
    STEPS = 3

    rng = np.random.default_rng(20260816)
    real_u8 = rng.integers(0, 256, (BATCH, H, W, 3), dtype=np.uint8)
    real = (real_u8.astype(np.float32) / 127.5) - 1.0  # Rescaling(1/127.5, -1)
    z_fwd = rng.uniform(-1.0, 1.0, (BATCH, Z)).astype(np.float32)
    z_steps = rng.uniform(-1.0, 1.0, (STEPS, BATCH, Z)).astype(np.float32)

    # --- Synthetic labeled image folder so SNDCGAN.__init__ runs unmodified
    # (get_dataset needs class subdirectories; SNDCGAN.py:131-145).
    data_dir = os.path.join(out, "data", "landscape")
    os.makedirs(data_dir, exist_ok=True)
    for i in range(8):
        img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        tf.io.write_file(
            os.path.join(data_dir, f"im{i}.png"), tf.io.encode_png(img)
        )

    # --- Instantiate the reference training class exactly as Trainer.py does.
    gan = ref.SNDCGAN(
        dir_path=os.path.join(out, "run"),
        dataset=os.path.join(out, "data"),
        batch_size=BATCH,
        dropout=0.0,  # deterministic comparison
        learning_rate_disc=2e-4,
        learning_rate_gen=2e-4,
        live_output=os.path.join(out, "live"),
        continue_=False,
        image_size=(H, W, 3),
        z_size=Z,
    )

    gan.gen_model.save(
        os.path.join(out, "gen_init.h5"), include_optimizer=False,
        save_format="h5",
    )
    gan.disc_model.save(
        os.path.join(out, "disc_init.h5"), include_optimizer=False,
        save_format="h5",
    )

    # --- Forward outputs at the initial weights, with the exact call flavors
    # the reference uses in train_step (no training flag for G, training=True
    # for D — SNDCGAN.py:243-244) and in sampling (training=False,
    # generator_output.py:26).
    g_out_default = gan.gen_model(z_fwd).numpy()
    g_out_train = gan.gen_model(z_fwd, training=True).numpy()
    g_out_eval = gan.gen_model(z_fwd, training=False).numpy()
    d_real_logits = gan.disc_model(real, training=True).numpy()
    d_fake_logits = gan.disc_model(g_out_default, training=True).numpy()

    # --- 3 reference train steps, executed by the reference's own method.
    traj = {k: [] for k in ("g_loss", "d_loss", "d_loss_real", "d_loss_fake",
                            "d_prob_real", "d_prob_fake")}
    for s in range(STEPS):
        outs = gan.train_step(
            tf.constant(real), tf.constant(z_steps[s])
        )
        if s == 0:
            # Post-step-1 weights: the regime where Adam's update is
            # ~±lr·sign(g) and cross-framework fp chaos is still confined to
            # isolated sign flips — the count-robust parity gate's target
            # (see test_weights_after_steps_parity's docstring and
            # benchmarks/diag_parity_flake.py).
            gan.gen_model.save(
                os.path.join(out, "gen_after1.h5"), include_optimizer=False,
                save_format="h5",
            )
            gan.disc_model.save(
                os.path.join(out, "disc_after1.h5"), include_optimizer=False,
                save_format="h5",
            )
        g_loss, d_loss, d_loss_real, d_loss_fake, lr_real, lr_fake = outs
        traj["g_loss"].append(float(g_loss.numpy()))
        traj["d_loss"].append(float(d_loss.numpy()))
        traj["d_loss_real"].append(float(d_loss_real.numpy()))
        traj["d_loss_fake"].append(float(d_loss_fake.numpy()))
        traj["d_prob_real"].append(float(tf.reduce_mean(tf.sigmoid(lr_real))))
        traj["d_prob_fake"].append(float(tf.reduce_mean(tf.sigmoid(lr_fake))))

    gan.gen_model.save(
        os.path.join(out, "gen_after.h5"), include_optimizer=False,
        save_format="h5",
    )
    gan.disc_model.save(
        os.path.join(out, "disc_after.h5"), include_optimizer=False,
        save_format="h5",
    )

    np.savez(
        os.path.join(out, "arrays.npz"),
        real_u8=real_u8,
        z_fwd=z_fwd,
        z_steps=z_steps,
        g_out_default=g_out_default,
        g_out_train=g_out_train,
        g_out_eval=g_out_eval,
        d_real_logits=d_real_logits,
        d_fake_logits=d_fake_logits,
        **{f"traj_{k}": np.asarray(v, np.float64) for k, v in traj.items()},
    )
    print("reference worker OK", flush=True)


if __name__ == "__main__":
    main()
