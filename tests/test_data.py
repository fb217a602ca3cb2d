"""Data pipeline tests: discovery, crop/resize semantics, determinism."""

import numpy as np
import pytest
from PIL import Image

from imagegeneration_tpu.core.data import (
    ImageFolderDataset,
    PairedDataset,
    SyntheticImageDataset,
    list_image_files,
    load_image,
    normalize_on_device,
    prefetch,
)


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = root / cls
        d.mkdir()
        for i in range(6):
            arr = rng.integers(0, 256, (40, 70, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{cls}{i}.png")
    return root


def test_list_image_files_labeled(image_root):
    files, labels, names = list_image_files(image_root, labeled=True)
    assert len(files) == 12
    assert names == ["a", "b"]
    assert labels[:6] == [0] * 6 and labels[6:] == [1] * 6


def test_list_image_files_unlabeled(image_root):
    files, labels, names = list_image_files(image_root, labeled=False)
    assert len(files) == 12 and names == []


def test_load_image_crop_to_aspect_ratio(tmp_path):
    # 100x200 source -> 50x50 target: crop width to 100 centered, resize.
    arr = np.zeros((100, 200, 3), dtype=np.uint8)
    arr[:, 50:150] = 255  # center block survives the crop
    p = tmp_path / "x.png"
    Image.fromarray(arr).save(p)
    out = load_image(p, (50, 50))
    assert out.shape == (50, 50, 3)
    assert out.mean() > 250  # crop kept the white center


def test_epoch_batches_deterministic_and_reshuffled(image_root):
    ds = ImageFolderDataset(image_root, (16, 28), labeled=True, seed=123)
    b0a = list(ds.epoch_batches(4, epoch=0))
    b0b = list(ds.epoch_batches(4, epoch=0))
    b1 = list(ds.epoch_batches(4, epoch=1))
    assert len(b0a) == 3  # 12 // 4
    np.testing.assert_array_equal(b0a[0], b0b[0])  # same seed+epoch => same
    assert not np.array_equal(b0a[0], b1[0])  # different epoch => reshuffled


def test_drop_remainder(image_root):
    ds = ImageFolderDataset(image_root, (16, 28), labeled=True)
    assert ds.num_batches(5, drop_remainder=True) == 2
    assert ds.num_batches(5, drop_remainder=False) == 3
    assert len(list(ds.epoch_batches(5, 0))) == 2


def test_paired_dataset(image_root):
    ds1 = ImageFolderDataset(image_root, (16, 28), labeled=False, seed=1)
    ds2 = SyntheticImageDataset(9, (16, 28), seed=2)
    pair = PairedDataset(ds1, ds2)
    assert pair.num_batches(4) == 2  # min(3, 2)
    batches = list(pair.epoch_batches(4, 0))
    assert len(batches) == 2
    bx, by = batches[0]
    assert bx.shape == by.shape == (4, 16, 28, 3)


def test_prefetch_preserves_order():
    items = list(prefetch(iter(range(20)), depth=3))
    assert items == list(range(20))


def test_normalize_on_device():
    import jax.numpy as jnp

    x = np.asarray([[0, 127.5, 255]], dtype=np.float64).astype(np.uint8)
    y = np.asarray(normalize_on_device(jnp.asarray(x)))
    np.testing.assert_allclose(y, [[-1.0, -0.00392157, 1.0]], atol=1e-6)


def test_epoch_batches_rows_slicing(image_root):
    """Multi-host replicated-cache feeding: rows=(lo, hi) yields exactly
    that block of each global batch — concatenating the two halves rebuilds
    the full-batch stream byte-for-byte."""
    ds = ImageFolderDataset(image_root, (16, 24))
    full = list(ds.epoch_batches(4, epoch=3))
    lo = list(ds.epoch_batches(4, epoch=3, rows=(0, 2)))
    hi = list(ds.epoch_batches(4, epoch=3, rows=(2, 4)))
    assert len(full) == len(lo) == len(hi)
    for f, a, b in zip(full, lo, hi):
        assert a.shape == (2, 16, 24, 3)
        np.testing.assert_array_equal(np.concatenate([a, b]), f)

    s = SyntheticImageDataset(12, (8, 8), seed=1)
    full = list(s.epoch_batches(4, epoch=0))
    parts = [list(s.epoch_batches(4, epoch=0, rows=(i, i + 2)))
             for i in (0, 2)]
    for f, a, b in zip(full, *parts):
        np.testing.assert_array_equal(np.concatenate([a, b]), f)


def test_host_sharded_dataset(image_root):
    """Host-sharded decode: the two shards partition the deterministic file
    list, each host caches only its slice, local batches draw only from it,
    and num_local_batches agrees across shards (SPMD lockstep)."""
    s0 = ImageFolderDataset(image_root, (16, 24), shard=(0, 2))
    s1 = ImageFolderDataset(image_root, (16, 24), shard=(1, 2))
    full = ImageFolderDataset(image_root, (16, 24))
    assert len(s0) + len(s1) == len(full) == 12
    assert [str(f) for f in s0.files] + [str(f) for f in s1.files] == [
        str(f) for f in full.files
    ]
    np.testing.assert_array_equal(
        np.concatenate([s0.images, s1.images]), full.images
    )
    assert s0.num_local_batches(2) == s1.num_local_batches(2) == 3

    # Local batches: drawn from the own shard only, reshuffled per epoch,
    # different streams per shard.
    def flat(batches):
        return np.concatenate(list(batches))

    b0 = flat(s0.local_epoch_batches(2, epoch=0))
    assert b0.shape == (6, 16, 24, 3)
    keys0 = {x.tobytes() for x in s0.images}
    assert all(x.tobytes() in keys0 for x in b0)
    b0b = flat(s0.local_epoch_batches(2, epoch=1))
    assert not np.array_equal(b0, b0b)  # reshuffled across epochs
    np.testing.assert_array_equal(
        b0, flat(s0.local_epoch_batches(2, epoch=0)))  # deterministic

    # Global epoch_batches is refused (no host holds the global permutation).
    with pytest.raises(ValueError):
        next(s0.epoch_batches(4, 0))
