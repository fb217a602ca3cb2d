"""Data-parallel (and spatially-partitioned) execution of fused train steps.

TPU-native scaling (new component; the reference is single-device — SURVEY.md
§2): the fused step function is jitted with sharding annotations —

  state   : replicated (P())
  batch   : P('data')  (optionally P('data','spatial') on H for config 5)
  metrics : replicated

XLA's SPMD partitioner turns the replicated-gradient requirement into ICI
all-reduces and conv spatial partitioning into halo exchanges; no collectives
are written by hand. Batch-statistics layers see per-shard batches (standard
non-sync BN semantics under data parallelism; the reference's effective batch
is tiny so this matches its statistical regime).
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imagegeneration_tpu.core import mesh as meshlib, platform as platformlib


def shard_train_step(
    step_fn: Callable,
    mesh: Mesh,
    spatial: bool = False,
    donate_state: bool = True,
    workload: str | None = None,
):
    """Jit a fused (state, batch) -> (state, metrics) step over a mesh."""
    state_sh = NamedSharding(mesh, P())
    batch_sh = meshlib.batch_sharding(mesh, spatial)
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, state_sh),
        donate_argnums=(0,) if donate_state else (),
        compiler_options=platformlib.tpu_compiler_options(workload),
    )


def replicate_state(state, mesh: Mesh):
    """Replicate a (host or single-device) state pytree over the mesh.

    Multi-process: device_put cannot write non-addressable shards, so each
    process contributes its own full copy via
    make_array_from_process_local_data (states are identical across
    processes by the seeded-init/replicated-update construction)."""
    ns = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(state, ns)
    import numpy as np

    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(ns, np.asarray(x)),
        state,
    )


def jit_epoch_runner(runner: Callable, mesh: Mesh | None, n_data: int,
                     workload: str | None = None):
    """Jit a device-resident epoch runner `(state, *data_args) -> (state,
    metrics)`. Under a mesh everything is replicated (state donated, the
    HBM dataset + permutation indices replicated); the runner itself
    reshards each gathered batch to the data axis in-program (see
    make_epoch_runner(mesh=...)). n_data = number of data args."""
    opts = platformlib.tpu_compiler_options(workload)
    if mesh is None:
        return jax.jit(runner, donate_argnums=0, compiler_options=opts)
    repl = NamedSharding(mesh, P())
    return jax.jit(
        runner,
        in_shardings=(repl,) * (n_data + 1),
        out_shardings=(repl, repl),
        donate_argnums=0,
        compiler_options=opts,
    )


def shard_paired_train_step(
    step_fn: Callable,
    mesh: Mesh,
    spatial: bool = False,
    donate_state: bool = True,
    workload: str | None = None,
):
    """Same as shard_train_step for (state, batch_x, batch_y) steps (CycleGAN)."""
    state_sh = NamedSharding(mesh, P())
    batch_sh = meshlib.batch_sharding(mesh, spatial)
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh, batch_sh),
        out_shardings=(state_sh, state_sh),
        donate_argnums=(0,) if donate_state else (),
        compiler_options=platformlib.tpu_compiler_options(workload),
    )
