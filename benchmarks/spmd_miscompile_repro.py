"""Regression probe for the XLA SPMD partitioner miscompile worked around in
train/common.make_replicator (see its docstring and tests/test_parallel.py).

Shape of the bug, reduced from the fused SNDCGAN step: under a
(data x spatial) batch sharding with H partitioned,

    grads  = grad(bce(D(x_sharded)))      # D params replicated; grads CORRECT
    params' = params - lr * grads          # plain SGD suffices to trigger it
    logits  = D(fake; params')             # fake comes from a REPLICATED
                                           # latent through the generator

the second forward returns numerically WRONG logits (d_loss_fake diverged
0.72 -> 1.15 at the 16x16 tiny config) unless params' is explicitly
constrained to replication. Bisect facts (this script re-verifies them):
- without the optimizer update, every quantity matches exactly;
- gradients themselves match (global norm identical);
- the miscompile needs the REAL discriminator (7-conv + Dense head) — a
  2-conv toy with a mean head compiles correctly, so the trigger is the
  partitioner's sharding choice for the updated conv kernels feeding the
  deeper second forward, not the update math.

Run on the 8-virtual-device CPU backend:

    python benchmarks/spmd_miscompile_repro.py

If this prints CLEAN after a jax/XLA upgrade, the make_replicator workaround
can be retired (re-run tests/test_parallel.py and the config-5 test first).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from imagegeneration_tpu.core.data import normalize_on_device  # noqa: E402
from imagegeneration_tpu.core.mesh import (  # noqa: E402
    MeshConfig,
    batch_sharding,
    make_mesh,
)
from imagegeneration_tpu.models.sndcgan import (  # noqa: E402
    SNDCGANConfig,
    make_models,
)
from imagegeneration_tpu.train import common  # noqa: E402
from imagegeneration_tpu.train.sndcgan_step import (  # noqa: E402
    SNDCGANTrainConfig,
    init_state,
)

TINY = SNDCGANConfig(image_size=(16, 16, 3), base_width=16, dropout_rate=0.0)


def make_step(constrain: bool, mesh):
    gen, disc = make_models(TINY)

    def step(st, batch_u8):
        x_real = normalize_on_device(batch_u8, jnp.float32)
        z = jax.random.uniform(
            jax.random.key(3), (batch_u8.shape[0], 128), minval=-1, maxval=1
        )
        fake, _ = gen.apply(
            {"params": st.g_params, "batch_stats": st.g_batch_stats},
            z, train=True, mutable=["batch_stats"],
        )
        fake = jax.lax.stop_gradient(fake)

        def d_real_fn(dp):
            lr = disc.apply(
                {"params": dp, "spectral": st.d_spectral},
                x_real, train=False, update_sn=False,
            )
            return common.bce_logits_mean(jnp.ones_like(lr), lr)

        d_loss_real, grads = jax.value_and_grad(d_real_fn)(st.d_params)
        d_mid = optax.apply_updates(
            st.d_params, jax.tree.map(lambda g: -0.1 * g, grads)
        )
        if constrain:
            d_mid = jax.tree.map(
                lambda p: jax.lax.with_sharding_constraint(
                    p, NamedSharding(mesh, P())
                ),
                d_mid,
            )
        lf = disc.apply(
            {"params": d_mid, "spectral": st.d_spectral},
            fake, train=False, update_sn=False,
        )
        d_loss_fake = common.bce_logits_mean(jnp.zeros_like(lf), lf)
        return {"d_loss_real": d_loss_real, "d_loss_fake": d_loss_fake}

    return step


def main() -> None:
    cfg = SNDCGANTrainConfig(model=TINY, batch_size=4, seed=7)
    state = init_state(cfg)
    batch = np.random.default_rng(1).integers(0, 256, (4, 16, 16, 3), np.uint8)

    mesh = make_mesh(MeshConfig(data=4, spatial=2))
    repl = NamedSharding(mesh, P())
    bsh = batch_sharding(mesh, spatial=True)

    ref = jax.jit(make_step(False, mesh))(state, batch)
    results = {}
    for constrain in (True, False):
        m = jax.jit(
            make_step(constrain, mesh),
            in_shardings=(repl, bsh),
            out_shardings=repl,
        )(jax.device_put(state, repl), jax.device_put(batch, bsh))
        results[constrain] = {k: float(v) for k, v in m.items()}

    r = {k: float(v) for k, v in ref.items()}
    print(f"single device      : {r}")
    print(f"mesh, constrained  : {results[True]}")
    print(f"mesh, UNconstrained: {results[False]}")
    ok = abs(results[True]["d_loss_fake"] - r["d_loss_fake"])
    bad = abs(results[False]["d_loss_fake"] - r["d_loss_fake"])
    assert ok < 1e-4, f"constrained path diverged ({ok:.2e}) — workaround broken!"
    if bad > 1e-3:
        print(f"REPRODUCED: unconstrained d_loss_fake off by {bad:.4f} "
              "-> make_replicator workaround still required")
    else:
        print("CLEAN: XLA no longer miscompiles this chain; "
              "make_replicator could be retired (re-run tests/test_parallel.py "
              "and tests/test_config5.py first)")


if __name__ == "__main__":
    main()
