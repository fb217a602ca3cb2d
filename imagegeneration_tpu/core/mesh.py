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
    """Place a host batch onto the mesh with the standard batch sharding.

    Single-process only: `batch` is the full GLOBAL batch living on this
    host. Multi-host feeding goes through `process_row_range` +
    `make_global_batch` instead (each process supplies only its rows)."""
    return jax.device_put(batch, batch_sharding(mesh, spatial))


# --------------------------------------------------------------- multi-host
# Per-host input feeding (new in round 5): on a multi-process pod no single
# host holds a global batch, so the feeding contract becomes
#
#   lo, hi = process_row_range(mesh, global_batch_size)   # my rows
#   local  = dataset.epoch_batches(B, epoch, rows=(lo, hi))  # decode my rows
#   global_arr = make_global_batch(mesh, local_np)         # assemble on mesh
#
# `make_global_batch` uses jax.make_array_from_process_local_data, which
# builds a *global* jax.Array from each process's shard with no cross-host
# data movement (rows land directly on the supplying process's devices; the
# batch sharding places row block d on mesh row d).


def process_row_range(mesh: Mesh, global_batch_size: int) -> tuple[int, int]:
    """Global-batch rows [lo, hi) that THIS process must supply.

    With the batch sharded P('data'[, 'spatial']), row block d of the batch
    lives on mesh row d. This process owns the rows of every mesh row that
    contains one of its addressable devices. Requirements (both are how
    meshes are laid out in practice, and both are checked):
    - each mesh row's devices belong to ONE process (the spatial axis — conv
      halo exchanges — must ride ICI inside a host, never DCN);
    - this process's mesh rows are contiguous (make_array_from_process_local_data
      assembles each process's rows as one block).
    """
    devs = mesh.devices.reshape(mesh.devices.shape[0], -1)
    n_data = devs.shape[0]
    if global_batch_size % n_data:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by data axis {n_data}"
        )
    pid = jax.process_index()
    mine = []
    for d in range(n_data):
        procs = {dev.process_index for dev in devs[d]}
        if pid in procs:
            if procs != {pid}:
                raise NotImplementedError(
                    f"mesh row {d} spans processes {sorted(procs)}: the "
                    "spatial axis must be process-local (halo exchanges on "
                    "ICI); re-shape the mesh with data outermost per host"
                )
            mine.append(d)
    if not mine:
        raise ValueError(f"process {pid} owns no devices of this mesh")
    if mine != list(range(mine[0], mine[-1] + 1)):
        raise ValueError(
            f"process {pid}'s mesh rows {mine} are not contiguous; use the "
            "default make_mesh layout (jax.devices() order groups per process)"
        )
    per = global_batch_size // n_data
    return mine[0] * per, (mine[-1] + 1) * per


def make_global_batch(
    mesh: Mesh, local_batch: np.ndarray, spatial: bool = False
) -> jax.Array:
    """Assemble a global batch from this process's row block.

    Single-process: `local_batch` IS the global batch (plain shard_batch).
    Multi-process: every process calls this with its `process_row_range`
    rows; the result is one global jax.Array sharded over the mesh."""
    if jax.process_count() == 1:
        return shard_batch(mesh, local_batch, spatial)
    return jax.make_array_from_process_local_data(
        batch_sharding(mesh, spatial), np.asarray(local_batch)
    )


def make_replicated_global(mesh: Mesh, arr) -> jax.Array:
    """Replicate a host array over the whole (possibly multi-process) mesh.

    Every process must pass the SAME array (e.g. the resident uint8 dataset
    decoded from a shared filesystem, or a seeded epoch permutation) — each
    host's devices are fed from its own copy, no cross-host transfer."""
    if jax.process_count() == 1:
        return jax.device_put(arr, replicated(mesh))
    return jax.make_array_from_process_local_data(
        replicated(mesh), np.asarray(arr)
    )


def is_main_process() -> bool:
    """True on the process that owns artifacts (checkpoints, previews, logs)."""
    return jax.process_index() == 0


def check_spatial_partition(
    min_sharded_h: int, spatial: int, family: str, image_h: int
) -> None:
    """Refuse spatial-sharding requests in the measured-degenerate regime.

    Round 4 measured (tests/test_parallel.py degenerate-regime docstrings;
    docs/STATUS.md round 4) that GSPMD produces SILENTLY WRONG numerics when
    a spatially-sharded conv's per-shard H extent falls below its kernel
    halo: at 1 row/shard the forward loss is ~0.3% off and conv gradients
    come out exactly 1/axis_size x. At >=2 rows/shard for every conv of the
    family's stride-2 cascade the programs are bit-exact. The engines'
    mesh tests stay out of that regime; this guard keeps USERS out of it
    too (VERDICT r4 #3): `min_sharded_h` is the family's smallest
    spatially-sharded feature height (models.*.min_sharded_height) and the
    request is refused unless every shard keeps >= 2 rows, evenly.

    Escape hatch: IMAGEGEN_ALLOW_DEGENERATE_SPATIAL=1 downgrades to a loud
    warning (e.g. to reproduce the miscompile itself,
    benchmarks/spmd_miscompile_repro.py).
    """
    if spatial <= 1:
        return
    extent, rem = divmod(min_sharded_h, spatial)
    if extent >= 2 and rem == 0:
        return
    msg = (
        f"{family}: --mesh-spatial {spatial} at image height {image_h} "
        f"leaves {extent} row(s) (+{rem} remainder) per shard on the "
        f"deepest sharded feature map (H={min_sharded_h}). GSPMD's "
        "halo/reduction resolution is measurably WRONG below 2 even rows "
        "per shard (forward ~0.3% off, gradients exactly 1/axis_size x — "
        "see core/mesh.check_spatial_partition docstring). Use a larger "
        "image, fewer spatial shards, or set "
        "IMAGEGEN_ALLOW_DEGENERATE_SPATIAL=1 to proceed anyway."
    )
    if os.environ.get("IMAGEGEN_ALLOW_DEGENERATE_SPATIAL") == "1":
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
        return
    raise ValueError(msg)
