"""Subprocess helper: run OUR fused CycleGAN step from reference-imported
weights and dump outputs for tests/test_reference_parity_cyclegan.py.

Runs in its own process so the full-size (9 res blocks, base 64) program can
compile with --xla_backend_optimization_level=1 — numerics-neutral, but
minutes instead of tens of minutes on this 1-core CPU host (see
tests/conftest.py's IMAGEGEN_CONFIG5 note).

Usage: python tests/_cyclegan_parity_ours.py <artifact_dir> <out_npz>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
for needed in (
    "--xla_force_host_platform_device_count=1",
    "--xla_backend_optimization_level=1",
):
    if needed.split("=")[0] not in flags:
        flags = (flags + " " + needed).strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
from imagegeneration_tpu.core.platform import setup_compile_cache

setup_compile_cache(jax)

import jax.numpy as jnp
import numpy as np

from imagegeneration_tpu.compat.keras_import import (
    import_cyclegan_discriminator,
    import_cyclegan_generator,
)
from imagegeneration_tpu.models.cyclegan import CycleGANConfig
from imagegeneration_tpu.train.cyclegan_step import (
    CycleGANTrainConfig,
    init_state,
    make_train_step,
    make_translators,
)


def main() -> None:
    art, out_npz = sys.argv[1], sys.argv[2]
    a = np.load(os.path.join(art, "arrays.npz"))

    cfg = CycleGANTrainConfig(
        model=CycleGANConfig(
            image_size=(96, 96, 3),
            quirk_axis1=True,  # the executed reference IS tfa axis=1
            in_backend="xla",
        ),
        batch_size=int(a["x_u8"].shape[0]),
    )
    state = init_state(cfg)
    state = state.replace(
        gg_params=import_cyclegan_generator(os.path.join(art, "gg_init.h5"))["params"],
        gf_params=import_cyclegan_generator(os.path.join(art, "gf_init.h5"))["params"],
        dx_params=import_cyclegan_discriminator(os.path.join(art, "dx_init.h5"))["params"],
        dy_params=import_cyclegan_discriminator(os.path.join(art, "dy_init.h5"))["params"],
    )

    # Initial forward parity (pre-training, imported weights).
    tg, tf_ = make_translators(cfg)
    x = (a["x_u8"].astype(np.float32) / 127.5) - 1.0
    y = (a["y_u8"].astype(np.float32) / 127.5) - 1.0
    fake_y0 = np.asarray(jax.jit(tg)(state, jnp.asarray(x)))
    fake_x0 = np.asarray(jax.jit(tf_)(state, jnp.asarray(y)))

    step = jax.jit(make_train_step(cfg))
    bx, by = jnp.asarray(a["x_u8"]), jnp.asarray(a["y_u8"])
    keys = ("gen_g_loss", "gen_f_loss", "identity_loss_g", "identity_loss_f",
            "total_gen_g_loss", "total_gen_f_loss", "total_cycle_loss")
    hist = {k: [] for k in keys}
    for _ in range(int(a["gen_g_loss"].shape[0])):
        state, m = step(state, bx, by)
        for k in keys:
            hist[k].append(float(m[k]))

    def flat(tree, prefix):
        return {
            f"{prefix}:{jax.tree_util.keystr(p)}": np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(tree)
        }

    np.savez(
        out_npz,
        fake_y0=fake_y0, fake_x0=fake_x0,
        **{k: np.asarray(v, np.float64) for k, v in hist.items()},
        **flat(state.gg_params, "gg"),
        **flat(state.gf_params, "gf"),
        **flat(state.dx_params, "dx"),
        **flat(state.dy_params, "dy"),
    )
    print("cyclegan ours OK", flush=True)


if __name__ == "__main__":
    main()
