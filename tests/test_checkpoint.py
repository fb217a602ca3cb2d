"""Checkpoint/resume round-trips and export/load."""

import jax
import jax.numpy as jnp
import numpy as np

from imagegeneration_tpu.core.checkpoint import (
    CheckpointManager,
    export_params,
    find_epoch_files,
    load_params,
)
from imagegeneration_tpu.core.metrics import LossHistory


def _tree_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_roundtrip_and_max_to_keep(tmp_path):
    mgr = CheckpointManager(tmp_path / "ck", max_to_keep=2)
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.asarray(7, jnp.int32),
    }
    for epoch in (0, 1, 2):
        state["step"] = jnp.asarray(epoch, jnp.int32)
        mgr.save(epoch, state)
    assert mgr.latest_epoch() == 2
    restored = mgr.restore(state)
    assert int(restored["step"]) == 2
    _tree_equal(restored["params"], state["params"])
    # max_to_keep=2 dropped epoch 0
    restored1 = mgr.restore(state, epoch=1)
    assert int(restored1["step"]) == 1
    mgr.close()


def test_export_load_params_raw_and_templated(tmp_path):
    tree = {"a": jnp.ones((3, 2)), "nested": {"b": jnp.zeros((4,))}}
    p = tmp_path / "m.msgpack"
    export_params(p, tree)
    raw = load_params(p)
    _tree_equal(raw, tree)
    templ = load_params(p, {"a": np.zeros((3, 2)), "nested": {"b": np.ones(4)}})
    _tree_equal(templ, tree)


def test_find_epoch_files(tmp_path):
    for e in (3, 0, 12):
        (tmp_path / f"gen_model-{e}.msgpack").write_bytes(b"x")
    (tmp_path / "other.txt").write_bytes(b"x")
    found = find_epoch_files(tmp_path, "gen_model-{epoch}.msgpack")
    assert [e for e, _ in found] == [0, 3, 12]


def test_loss_history_roundtrip(tmp_path):
    p = tmp_path / "losses.pickle"
    h = LossHistory(p, ("epoch", "g"))
    h.append(epoch=0, g=1.0)
    h.extend({"epoch": [1], "g": [2.0]})
    h.save()
    h2 = LossHistory(p, ("epoch", "g"))
    assert h2.data["epoch"] == [0, 1]
    assert h2.data["g"] == [1.0, 2.0]
    h2.plot(tmp_path / "plot.png")
    assert (tmp_path / "plot.png").exists()
