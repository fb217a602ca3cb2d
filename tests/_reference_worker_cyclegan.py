"""Subprocess worker: execute the ACTUAL reference CycleGAN code and dump
artifacts for cross-framework parity tests.

/root/reference/cyclegan/CycleGAN.py:23 imports
`tensorflow_addons.layers.InstanceNormalization`, and tfa is not installable
in this image — so a minimal, semantics-equivalent shim is injected into
`sys.modules` BEFORE the import: tfa's InstanceNormalization IS
GroupNormalization(groups=-1) (one group per element of `axis`), and legacy
Keras ships GroupNormalization with the same epsilon placement (validated in
round 2 against tf_keras fixtures, tests/test_weights_import_fixtures.py).
With axis=1 on NHWC inputs that reproduces the reference's height-axis quirk:
per-H statistics over (W, C) with per-H gamma/beta.

The worker then instantiates the real CycleGAN class (models, 4 Adam
optimizers) and drives its real @tf.function train_step
(cyclegan/CycleGAN.py:325-382) for 3 steps on fixed batches, writing:

  {gg,gf,dx,dy}_init.h5   — save_weights of all four nets before training
  arrays.npz              — fixed batches + the 7 reported loss trajectories
  {gg,gf,dx,dy}_after.h5  — save_weights after 3 train steps

96x96 inputs: the smallest size accepted by the reference PatchGAN's VALID
4x4 stack (>=94) that the generator's /4 downsample divides.

Usage: python tests/_reference_worker_cyclegan.py <ref_root> <out_dir>
"""

import os
import sys
import types


def install_tfa_shim() -> None:
    import tf_keras as keras2

    class InstanceNormalization(keras2.layers.GroupNormalization):
        """tfa.layers.InstanceNormalization == GroupNormalization(groups=-1)
        with tfa's default epsilon=1e-3 (tfa/layers/normalizations.py)."""

        def __init__(self, axis=-1, **kwargs):
            kwargs.setdefault("epsilon", 1e-3)
            super().__init__(groups=-1, axis=axis, **kwargs)

    tfa = types.ModuleType("tensorflow_addons")
    tfa_layers = types.ModuleType("tensorflow_addons.layers")
    tfa_layers.InstanceNormalization = InstanceNormalization
    tfa.layers = tfa_layers
    sys.modules["tensorflow_addons"] = tfa
    sys.modules["tensorflow_addons.layers"] = tfa_layers


def write_dataset_dir(path: str, images_u8) -> None:
    """Folder of PNGs for the reference Loader's
    image_dataset_from_directory (labels=None needs files in the root)."""
    import tensorflow as tf

    os.makedirs(path, exist_ok=True)
    for i, img in enumerate(images_u8):
        png = tf.io.encode_png(tf.convert_to_tensor(img)).numpy()
        with open(os.path.join(path, f"img{i}.png"), "wb") as f:
            f.write(png)


def main() -> None:
    ref_root, out = sys.argv[1], sys.argv[2]
    os.makedirs(out, exist_ok=True)

    import numpy as np
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    # Pin TF to one thread: under full-suite CPU contention TF's thread pool
    # splits reductions differently run-to-run, which flips the sign of
    # near-cancelling gradient sums and moves isolated coordinates by a full
    # Adam sign-flip unit — the parity test's small-leaf bulk criterion then
    # flakes with load (observed: res-block bias 93.4% vs 95% in-suite,
    # passes in isolation). One thread = one reduction order.
    tf.config.threading.set_intra_op_parallelism_threads(1)
    tf.config.threading.set_inter_op_parallelism_threads(1)
    tf.random.set_seed(11)
    np.random.seed(13)

    install_tfa_shim()
    # CycleGAN.py:1 has a DEAD `import imp` (module removed in Python 3.12);
    # stub it so the reference runs unmodified.
    if "imp" not in sys.modules:
        sys.modules["imp"] = types.ModuleType("imp")
    sys.path.insert(0, os.path.join(ref_root, "cyclegan"))
    import CycleGAN as ref

    H = W = 96
    B = 1
    STEPS = 3

    rng = np.random.default_rng(20260818)
    x_u8 = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    y_u8 = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    write_dataset_dir(os.path.join(out, "ds_x"), x_u8)
    write_dataset_dir(os.path.join(out, "ds_y"), y_u8)

    gan = ref.CycleGAN(
        dataset1_path=os.path.join(out, "ds_x"),
        dataset2_path=os.path.join(out, "ds_y"),
        path_like=os.path.join(out, "run"),
        batch_size=B,
        image_size=(H, W),
    )

    # Rescaling(1/127.5, -1) as in cyclegan/data_loader.py
    real_x = tf.convert_to_tensor(x_u8.astype(np.float32) / 127.5 - 1.0)
    real_y = tf.convert_to_tensor(y_u8.astype(np.float32) / 127.5 - 1.0)

    # Build all four nets with a forward pass, then snapshot initial weights
    # and initial forward outputs.
    fake_y0 = gan.generator_g(real_x, training=True).numpy()
    fake_x0 = gan.generator_f(real_y, training=True).numpy()
    dx0 = gan.discriminator_x(real_x, training=True).numpy()
    dy0 = gan.discriminator_y(real_y, training=True).numpy()

    for name, net in (
        ("gg", gan.generator_g), ("gf", gan.generator_f),
        ("dx", gan.discriminator_x), ("dy", gan.discriminator_y),
    ):
        net.save_weights(os.path.join(out, f"{name}_init.h5"), save_format="h5")

    keys = ("gen_g_loss", "gen_f_loss", "identity_loss_g", "identity_loss_f",
            "total_gen_g_loss", "total_gen_f_loss", "total_cycle_loss")
    hist = {k: [] for k in keys}
    for _ in range(STEPS):
        losses = gan.train_step(real_x, real_y)
        for k in keys:
            hist[k].append(float(losses[k]))

    for name, net in (
        ("gg", gan.generator_g), ("gf", gan.generator_f),
        ("dx", gan.discriminator_x), ("dy", gan.discriminator_y),
    ):
        net.save_weights(os.path.join(out, f"{name}_after.h5"), save_format="h5")

    np.savez(
        os.path.join(out, "arrays.npz"),
        x_u8=x_u8, y_u8=y_u8,
        fake_y0=fake_y0, fake_x0=fake_x0, dx0=dx0, dy0=dy0,
        **{k: np.asarray(v, np.float64) for k, v in hist.items()},
    )
    print("cyclegan reference worker OK", flush=True)


if __name__ == "__main__":
    main()
