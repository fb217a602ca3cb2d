"""Device mesh + multi-host initialization — the comm layer the reference lacks.

The reference trains on one GPU with no distribution of any kind (SURVEY.md §2
checklist; README.md:15). This module is the new, first-class TPU equivalent:
a `jax.sharding.Mesh` with two axes,

  "data"    — data parallelism: batches sharded, gradients all-reduced by XLA
              over ICI (the NCCL-equivalent with zero user-visible collectives),
  "spatial" — optional H-axis partitioning of activations for beyond-HBM
              resolutions (BASELINE config 5, 512x288): XLA SPMD inserts the
              conv halo exchanges automatically.

Everything downstream annotates arrays with `NamedSharding(mesh, P(...))` and
lets the compiler insert collectives (the scaling-book recipe): there is no
hand-written all-reduce anywhere in the framework.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def maybe_init_distributed() -> None:
    """Initialize jax.distributed for multi-host pods when env is present.

    Single-process (the common case, incl. tests) is a no-op.

    Ordering matters: `jax.distributed.initialize()` must run BEFORE anything
    touches the jax backend (`jax.devices()`, `jax.process_count()`, any
    computation) — touching the backend first initializes it single-process
    and the later `initialize()` is ineffective or errors. So this is purely
    env-gated and idempotent: we only consult `jax.distributed` client state
    (not the backend) to detect a prior call.
    """
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    )
    if not coord:
        return  # single-process: never touch jax.distributed
    if jax.distributed.is_initialized():
        return  # already initialized (idempotent re-entry)
    # Explicit process geometry (non-cloud launchers, tests) rides the same
    # env contract; on Cloud TPU pods these are unset and initialize()
    # auto-detects everything from the metadata service.
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if num is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(num),
            process_id=int(pid),
        )
    else:
        jax.distributed.initialize()


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all remaining devices
    spatial: int = 1


def make_mesh(cfg: MeshConfig = MeshConfig()) -> Mesh:
    """Build a (data, spatial) mesh over all addressable-and-global devices.

    The data axis is outermost so that spatial groups map to ICI-adjacent
    device blocks (halo exchanges stay on the fastest links).
    """
    n = jax.device_count()
    spatial = max(1, cfg.spatial)
    data = cfg.data if cfg.data > 0 else n // spatial
    if data * spatial != n:
        raise ValueError(
            f"mesh {data}x{spatial} != device count {n}"
        )
    devices = np.asarray(jax.devices()).reshape(data, spatial)
    return Mesh(devices, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for an NHWC batch: N over 'data', optionally H over 'spatial'."""
    if spatial:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: np.ndarray, spatial: bool = False) -> jax.Array:
    """Place a host batch onto the mesh with the standard batch sharding."""
    return jax.device_put(batch, batch_sharding(mesh, spatial))
