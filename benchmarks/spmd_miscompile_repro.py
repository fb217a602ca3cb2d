"""Minimal repro of the XLA SPMD partitioner miscompile worked around in
train/common.make_replicator (see its docstring and tests/test_parallel.py).

Shape of the bug: inside ONE jitted program, under a (data x spatial) batch
sharding with H partitioned,

    grads = grad(loss(D(x_sharded)))          # D params replicated
    new_params = adam_apply(params, grads)
    second_logits = D'(x2_sharded; new_params) # forward with UPDATED params

the partitioner propagates a spatial sharding into `new_params` feeding the
second forward, producing numerically WRONG results (observed ~2x divergence
in the second loss) — unless every post-apply parameter tree is explicitly
constrained to replication (lax.with_sharding_constraint(..., P())), which is
what make_replicator installs inside the fused train steps.

Run on the 8-virtual-device CPU backend:

    python benchmarks/spmd_miscompile_repro.py

Prints the single-device loss, the constrained-mesh loss (must match), and
the unconstrained-mesh loss (diverges when the underlying XLA bug is
present; if XLA fixes it, this script reports CLEAN and the workaround can
be retired).
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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def make_step(constrain: bool, mesh):
    """One G-then-D-ish chain: loss1 -> sgd update -> loss2 on new params."""

    def conv_net(params, x):
        y = jax.lax.conv_general_dilated(
            x, params["k1"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        y = jax.nn.leaky_relu(y, 0.1)
        y = jax.lax.conv_general_dilated(
            y, params["k2"], (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.mean(y, axis=(1, 2, 3))

    def step(params, x1, x2):
        loss1, grads = jax.value_and_grad(
            lambda p: jnp.mean(jnp.square(conv_net(p, x1) - 1.0))
        )(params)
        new_params = jax.tree.map(lambda p, g: p - 0.1 * g, params, grads)
        if constrain:
            new_params = jax.tree.map(
                lambda p: jax.lax.with_sharding_constraint(
                    p, NamedSharding(mesh, P())
                ),
                new_params,
            )
        loss2 = jnp.mean(jnp.square(conv_net(new_params, x2)))
        return loss1, loss2

    return step


def main() -> None:
    rng = np.random.default_rng(0)
    params = {
        "k1": jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 16)), jnp.float32),
        "k2": jnp.asarray(rng.normal(0, 0.1, (4, 4, 16, 16)), jnp.float32),
    }
    x1 = jnp.asarray(rng.normal(0, 1, (4, 16, 16, 3)), jnp.float32)
    x2 = jnp.asarray(rng.normal(0, 1, (4, 16, 16, 3)), jnp.float32)

    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "spatial"))
    batch_sh = NamedSharding(mesh, P("data", "spatial"))
    repl = NamedSharding(mesh, P())

    l1_ref, l2_ref = jax.jit(make_step(False, mesh))(params, x1, x2)

    results = {}
    for constrain in (True, False):
        step = jax.jit(
            make_step(constrain, mesh),
            in_shardings=(repl, batch_sh, batch_sh),
            out_shardings=(repl, repl),
        )
        l1, l2 = step(
            jax.device_put(params, repl),
            jax.device_put(x1, batch_sh),
            jax.device_put(x2, batch_sh),
        )
        results[constrain] = (float(l1), float(l2))

    print(f"single device      : loss1={float(l1_ref):.6f} loss2={float(l2_ref):.6f}")
    print(f"mesh, constrained  : loss1={results[True][0]:.6f} loss2={results[True][1]:.6f}")
    print(f"mesh, UNconstrained: loss1={results[False][0]:.6f} loss2={results[False][1]:.6f}")
    bad = abs(results[False][1] - float(l2_ref)) / max(abs(float(l2_ref)), 1e-9)
    ok = abs(results[True][1] - float(l2_ref)) / max(abs(float(l2_ref)), 1e-9)
    assert ok < 1e-4, f"constrained path diverged ({ok:.2%}) — workaround broken!"
    if bad > 1e-3:
        print(f"REPRODUCED: unconstrained loss2 off by {bad:.2%} -> workaround required")
    else:
        print("CLEAN: XLA no longer miscompiles this chain; "
              "make_replicator could be retired (re-test the full step first)")


if __name__ == "__main__":
    main()
