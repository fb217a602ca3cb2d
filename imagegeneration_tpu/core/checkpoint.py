"""Orbax checkpoint/resume + portable params-only exports.

Fills the roles of the reference's three mechanisms (SURVEY.md §5):
- tf.train.Checkpoint/CheckpointManager bundles of models+optimizers with
  max_to_keep and epoch-numbered saves (sndcgan/SNDCGAN.py:181-199,
  cyclegan/CycleGAN.py:250-269)            -> Orbax CheckpointManager over the
  whole train-state pytree, save(step=epoch), restore-latest;
- Keras .h5 full-model/weights exports for offline sampling & eval
  (sndcgan/SNDCGAN.py:327-331, wasserstein_gan/WGAN.py:263-266,
  cyclegan/CycleGAN.py:414-420)            -> msgpack params-only export files
  (`export_params` / `load_params`), epoch-stamped with the same filename
  conventions (`gen_model-<epoch>`, `model_%04d`, `gen_weights_g-<epoch>`);
- pickled loss history (sndcgan/SNDCGAN.py:174-179 etc.) -> core/metrics.py.

Orbax is multi-host-safe, so the same path is the failure-recovery story:
idempotent restart from the latest checkpoint.
"""

from __future__ import annotations

import pathlib
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager for whole-state pytrees."""

    def __init__(self, directory: str | pathlib.Path, max_to_keep: int = 2):
        self._dir = pathlib.Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, epoch: int, state: Any, force: bool = False) -> None:
        self._mgr.save(
            epoch, args=ocp.args.StandardSave(jax.device_get(state)), force=force
        )
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> int | None:
        return self._mgr.latest_step()

    def all_epochs(self) -> list[int]:
        return sorted(self._mgr.all_steps())

    def restore(self, state_template: Any, epoch: int | None = None) -> Any:
        """Restore into the structure of `state_template` (abstract ok)."""
        step = self._mgr.latest_step() if epoch is None else epoch
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self._dir}")
        target = jax.tree.map(np.asarray, jax.device_get(state_template))
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def close(self) -> None:
        self._mgr.close()


def export_params(path: str | pathlib.Path, tree: Any) -> None:
    """Portable params-only artifact (the .h5 role) as flax msgpack."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(jax.device_get(tree)))


def load_params(path: str | pathlib.Path, template: Any | None = None) -> Any:
    """Load a params export. Without a template returns the raw dict tree
    (numpy leaves) — preferred: no eager model.init is needed to restore."""
    data = pathlib.Path(path).read_bytes()
    if template is None:
        return serialization.msgpack_restore(data)
    return serialization.from_bytes(template, data)


def find_epoch_files(
    directory: str | pathlib.Path, pattern: str
) -> list[tuple[int, pathlib.Path]]:
    """List (epoch, path) for files matching a `{epoch}`-templated pattern,
    sorted by epoch — the glob+parse idiom of generator_output.py:55-59."""
    directory = pathlib.Path(directory)
    rx = re.compile(
        "^" + re.escape(pattern).replace(re.escape("{epoch}"), r"(\d+)") + "$"
    )
    out = []
    if directory.exists():
        for p in directory.iterdir():
            m = rx.match(p.name)
            if m:
                out.append((int(m.group(1)), p))
    return sorted(out)
