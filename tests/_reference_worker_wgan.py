"""Subprocess worker: execute the ACTUAL reference WGAN code and dump
artifacts for cross-framework parity tests.

Imports /root/reference/wasserstein_gan/WGAN.py as-is (plus sndcgan/ on
sys.path for its `from generator_output import plot_image` cross-dir import,
WGAN.py:30), instantiates the real WGAN class, drives its real Keras
train_on_batch primitives in the exact train-loop cadence (WGAN.py:292-318,
n_critic=2 here), and writes:

  gen_init.h5 / critic_init.h5    — initial full-model h5 saves
  arrays.npz                      — fixed inputs + loss trajectories
  gen_after.h5 / critic_after.h5  — weights after 4 batches (2 gan updates)

Usage: python tests/_reference_worker_wgan.py <ref_root> <out_dir>
"""

import os
import sys


def main() -> None:
    ref_root, out = sys.argv[1], sys.argv[2]
    os.makedirs(out, exist_ok=True)
    sys.path.insert(0, os.path.join(ref_root, "sndcgan"))
    sys.path.insert(0, os.path.join(ref_root, "wasserstein_gan"))

    import numpy as np
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    # One TF thread => one reduction order (see _reference_worker_cyclegan;
    # thread-pool splits under CPU load flip near-cancelling gradient sums).
    tf.config.threading.set_intra_op_parallelism_threads(1)
    tf.config.threading.set_inter_op_parallelism_threads(1)
    import WGAN as ref

    H, W, B, Z = 48, 80, 4, 128
    N_CRITIC = 2
    BATCHES = 4

    rng = np.random.default_rng(20260817)
    real_u8 = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    real = (real_u8.astype(np.float32) / 127.5) - 1.0  # Rescaling(1/127.5,-1)
    z_fakes = rng.standard_normal((BATCHES, B, Z)).astype(np.float32)
    z_gans = rng.standard_normal((BATCHES // N_CRITIC, B, Z)).astype(np.float32)

    gan = ref.WGAN(
        dataset=None,
        image_size=(H, W, 3),
        bach_size=B,
        critic_learn_iterations=N_CRITIC,
        path_like=os.path.join(out, "run"),
        load=False,
    )
    gan.generator_model.save(
        os.path.join(out, "gen_init.h5"), include_optimizer=False,
        save_format="h5",
    )
    gan.critic_model.save(
        os.path.join(out, "critic_init.h5"), include_optimizer=False,
        save_format="h5",
    )

    neg = -np.ones((B, 1), np.float32)
    pos = np.ones((B, 1), np.float32)
    c1_losses, c2_losses, g_losses = [], [], []
    for i in range(BATCHES):
        # critic on real (labels -1), WGAN.py:298
        c1_losses.append(float(gan.critic_model.train_on_batch(real, neg)))
        # fake batch via predict (inference-mode G), WGAN.py:220-227
        fake = gan.generator_model.predict(z_fakes[i], verbose=0)
        # critic on fake (labels +1), WGAN.py:303
        c2_losses.append(float(gan.critic_model.train_on_batch(fake, pos)))
        if (i + 1) % N_CRITIC == 0:
            # combined-model update (labels -1), WGAN.py:306-318
            g_losses.append(
                float(gan.gan_model.train_on_batch(z_gans[i // N_CRITIC], neg))
            )

    gan.generator_model.save(
        os.path.join(out, "gen_after.h5"), include_optimizer=False,
        save_format="h5",
    )
    gan.critic_model.save(
        os.path.join(out, "critic_after.h5"), include_optimizer=False,
        save_format="h5",
    )
    np.savez(
        os.path.join(out, "arrays.npz"),
        real_u8=real_u8, z_fakes=z_fakes, z_gans=z_gans,
        c1_losses=np.asarray(c1_losses, np.float64),
        c2_losses=np.asarray(c2_losses, np.float64),
        g_losses=np.asarray(g_losses, np.float64),
    )
    print("wgan reference worker OK", flush=True)


if __name__ == "__main__":
    main()
