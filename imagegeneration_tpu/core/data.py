"""Host-side image-folder input pipeline, designed for TPU feeding.

Replicates the observable semantics of the reference's
`tf.keras.utils.image_dataset_from_directory(seed=123, crop_to_aspect_ratio=True)`
+ `Rescaling(1/127.5, -1)` + `.cache().shuffle(N).prefetch(AUTOTUNE)` pipelines
(sndcgan/SNDCGAN.py:131-145, wasserstein_gan/Trainer.py:15-31,
cyclegan/data_loader.py:5-41) with a TPU-first shape:

- decoded images are cached **once** as one contiguous uint8 array (the
  datasets are ~7k images => <1 GB; the reference's `.cache()` does the same
  in TF-tensor form);
- shuffling/batching are O(1) numpy index ops per epoch, reshuffled each epoch
  from a seeded stream (seed 123 by default);
- batches leave the host as **uint8**; the `x/127.5 - 1` rescale runs on
  device *inside* the jitted train step, which both quarters host->device
  transfer bytes and lets XLA fuse normalization into the first conv;
- a single background prefetch thread overlaps decode/transfer with TPU
  compute (the host has few cores — heavy per-batch host work is avoided by
  the cache design rather than by thread pools).

Deliberate deltas from TF (documented):
- TF batches *before* cache/shuffle, so it shuffles whole batches and carries
  one short remainder batch around (reference CycleGAN's Loader re-pulls to
  skip it, data_loader.py:32-41). Under jit, shapes must be static, so this
  pipeline shuffles *images* and drops the remainder (`drop_remainder=True`).
  Same images per epoch up to the remainder, strictly better shuffling.
- Resize is cv2 bilinear after an aspect-preserving center crop — the same
  operation `crop_to_aspect_ratio=True` performs; pixel values can differ by
  ±1 LSB from TF's resize kernel (within the FID-parity tolerance).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

try:  # cv2 is the fast decode path; PIL is the fallback.
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from PIL import Image

from imagegeneration_tpu.core.rng import DEFAULT_DATA_SEED, KeyChain

# Extensions accepted by keras.utils.image_dataset_from_directory.
ALLOWED_EXTENSIONS = (".bmp", ".gif", ".jpeg", ".jpg", ".png")


def list_image_files(
    root: str | Path,
    labeled: bool = True,
    follow_links: bool = False,
) -> tuple[list[Path], list[int], list[str]]:
    """Enumerate image files the way image_dataset_from_directory does.

    labeled=True: each subdirectory of `root` is one class (SNDCGAN path,
    sndcgan/SNDCGAN.py:134-139); labeled=False: all images under root,
    recursively (WGAN/CycleGAN path, labels=None).
    Returns (files, integer labels, class names), deterministically sorted.
    """
    root = Path(root)
    if not root.exists():
        raise FileNotFoundError(f"dataset directory not found: {root}")

    def _walk(d: Path) -> list[Path]:
        out = []
        for p in sorted(d.rglob("*")):
            if p.is_file() and p.suffix.lower() in ALLOWED_EXTENSIONS:
                if not follow_links and p.is_symlink():
                    continue
                out.append(p)
        return out

    if labeled:
        class_dirs = sorted(p for p in root.iterdir() if p.is_dir())
        files: list[Path] = []
        labels: list[int] = []
        names = [d.name for d in class_dirs]
        for idx, d in enumerate(class_dirs):
            fs = _walk(d)
            files.extend(fs)
            labels.extend([idx] * len(fs))
        if not files:
            raise FileNotFoundError(f"no images under class dirs of {root}")
        return files, labels, names
    files = _walk(root)
    if not files:
        raise FileNotFoundError(f"no images under {root}")
    return files, [0] * len(files), []


def load_image(
    path: str | Path, image_size: tuple[int, int], crop_to_aspect_ratio: bool = True
) -> np.ndarray:
    """Decode one image to uint8 (H, W, 3), center-cropped to the target
    aspect ratio then bilinearly resized (TF crop_to_aspect_ratio semantics).

    Decode priority: the native libjpeg extension (ops/native/fastimage —
    DCT-prescaled decode + single-pass crop/resize, GIL-free), then cv2,
    then PIL."""
    th, tw = image_size
    path = Path(path)
    if path.suffix.lower() in (".jpg", ".jpeg"):
        from imagegeneration_tpu.ops.native import get_fastimage

        fi = get_fastimage()
        if fi is not None:
            try:
                raw = fi.decode_resize_jpeg(
                    path.read_bytes(), th, tw, crop_to_aspect_ratio
                )
                return np.frombuffer(raw, dtype=np.uint8).reshape(th, tw, 3)
            except ValueError:
                pass  # e.g. grayscale/CMYK jpeg -> generic fallback
    img = None
    if _HAS_CV2:
        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if img is not None:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if img is None:  # cv2 missing or unsupported format (e.g. gif)
        with Image.open(path) as im:
            img = np.asarray(im.convert("RGB"))
    h, w = img.shape[:2]
    if crop_to_aspect_ratio and (h * tw != w * th):
        # Largest centered crop with the target aspect ratio.
        if h * tw > w * th:  # too tall -> crop height
            ch = (w * th) // tw
            top = (h - ch) // 2
            img = img[top : top + ch]
        else:  # too wide -> crop width
            cw = (h * tw) // th
            left = (w - cw) // 2
            img = img[:, left : left + cw]
    if img.shape[:2] != (th, tw):
        if _HAS_CV2:
            img = cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)
        else:  # pragma: no cover
            img = np.asarray(
                Image.fromarray(img).resize((tw, th), Image.BILINEAR)
            )
    return np.ascontiguousarray(img, dtype=np.uint8)


@dataclasses.dataclass
class ImageFolderDataset:
    """Decoded-and-cached image folder with per-epoch reshuffled uint8 batches.

    Multi-host feeding (new in round 5; core/mesh.py has the mesh half):

    - **Replicated-cache mode** (default, `shard=None`): every host decodes
      the full folder once (the datasets at reference scale are <1 GB) and
      per epoch all hosts compute the IDENTICAL global permutation; each
      process materializes only its `rows=(lo, hi)` slice of every global
      batch (`epoch_batches(rows=...)`). Batch composition — and therefore
      the training trajectory — is bitwise the same as a single-process run.
    - **Host-sharded mode** (`shard=(index, num_shards)`): each host decodes
      only its contiguous slice of the (deterministic, label-ordered) file
      list and per epoch shuffles it locally; `local_epoch_batches` yields
      this host's rows of each global batch. O(dataset/P) host memory and
      decode — the at-scale path. Global batches are then unions of per-host
      samples (the standard pod input layout, e.g. tf.data service/grain);
      statistically equivalent to, but not bitwise comparable with, the
      single-process shuffle.
    """

    root: str | Path
    image_size: tuple[int, int]  # (H, W)
    labeled: bool = True
    follow_links: bool = False
    seed: int = DEFAULT_DATA_SEED
    shard: tuple[int, int] | None = None  # (shard_index, num_shards)

    def __post_init__(self) -> None:
        self.files, self.labels, self.class_names = list_image_files(
            self.root, self.labeled, self.follow_links
        )
        if self.shard is not None:
            i, n_shards = self.shard
            if not 0 <= i < n_shards:
                raise ValueError(f"bad shard {self.shard}")
            # Deterministic contiguous split: every host derives the same
            # boundaries from the same sorted file list, no coordination.
            bounds = np.linspace(0, len(self.files), n_shards + 1).astype(int)
            self._shard_sizes = np.diff(bounds)
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            self.files = self.files[lo:hi]
            self.labels = self.labels[lo:hi]
        h, w = self.image_size
        n = len(self.files)
        self._images = np.empty((n, h, w, 3), dtype=np.uint8)
        self._label_arr = np.asarray(self.labels, dtype=np.int32)
        for i, f in enumerate(self.files):
            self._images[i] = load_image(f, self.image_size)
        self._chain = KeyChain(self.seed)

    def __len__(self) -> int:
        return len(self.files)

    @property
    def images(self) -> np.ndarray:
        return self._images

    def num_batches(self, batch_size: int, drop_remainder: bool = True) -> int:
        n = len(self)
        return n // batch_size if drop_remainder else -(-n // batch_size)

    def epoch_batches(
        self,
        batch_size: int,
        epoch: int,
        drop_remainder: bool = True,
        with_labels: bool = False,
        rows: tuple[int, int] | None = None,
    ) -> Iterator[np.ndarray] | Iterator[tuple[np.ndarray, np.ndarray]]:
        """Yield uint8 (B,H,W,3) batches, reshuffled per epoch from seed.

        `rows=(lo, hi)`: yield only that row block of each global batch
        (multi-host replicated-cache feeding — the permutation stays global
        and identical on every host, see core/mesh.process_row_range)."""
        if self.shard is not None:
            raise ValueError(
                "host-sharded dataset: use local_epoch_batches (the global "
                "permutation does not exist on any single host)"
            )
        rng = self._chain.numpy_rng("data", epoch)
        perm = rng.permutation(len(self))
        nb = self.num_batches(batch_size, drop_remainder)
        lo, hi = rows if rows is not None else (0, batch_size)
        for b in range(nb):
            idx = perm[b * batch_size : (b + 1) * batch_size][lo:hi]
            batch = self._images[idx]
            if with_labels:
                yield batch, self._label_arr[idx]
            else:
                yield batch

    # ----------------------------------------------------- host-sharded mode
    def num_local_batches(self, local_batch_size: int) -> int:
        """Batches per epoch in host-sharded mode — computed from the
        DETERMINISTIC shard boundaries, so every host (whatever its own
        shard size) arrives at the same count and the SPMD programs stay in
        lockstep (a host with one extra batch would deadlock the others'
        collectives)."""
        if self.shard is None:
            raise ValueError("not a host-sharded dataset")
        return int(self._shard_sizes.min()) // local_batch_size

    def local_epoch_batches(
        self, local_batch_size: int, epoch: int
    ) -> Iterator[np.ndarray]:
        """This host's rows of each global batch, drawn from its own shard
        with a per-(epoch, shard) seeded local shuffle."""
        if self.shard is None:
            raise ValueError("not a host-sharded dataset")
        import jax

        key = jax.random.fold_in(
            self._chain.at_step("data", epoch), self.shard[0]
        )
        rng = np.random.default_rng(
            np.asarray(jax.random.key_data(key), dtype=np.uint32)
        )
        perm = rng.permutation(len(self))
        for b in range(self.num_local_batches(local_batch_size)):
            yield self._images[perm[b * local_batch_size : (b + 1) * local_batch_size]]


class SyntheticImageDataset:
    """Deterministic random-image dataset (tests / benchmarks, no disk I/O)."""

    def __init__(
        self,
        num_images: int,
        image_size: tuple[int, int],
        seed: int = DEFAULT_DATA_SEED,
    ) -> None:
        h, w = image_size
        rng = np.random.default_rng(seed)
        self._images = rng.integers(
            0, 256, size=(num_images, h, w, 3), dtype=np.uint8
        )
        self._chain = KeyChain(seed)

    def __len__(self) -> int:
        return self._images.shape[0]

    @property
    def images(self) -> np.ndarray:
        return self._images

    def num_batches(self, batch_size: int, drop_remainder: bool = True) -> int:
        n = len(self)
        return n // batch_size if drop_remainder else -(-n // batch_size)

    def epoch_batches(
        self,
        batch_size: int,
        epoch: int,
        drop_remainder: bool = True,
        rows: tuple[int, int] | None = None,
    ) -> Iterator[np.ndarray]:
        rng = self._chain.numpy_rng("data", epoch)
        perm = rng.permutation(len(self))
        nb = self.num_batches(batch_size, drop_remainder)
        lo, hi = rows if rows is not None else (0, batch_size)
        for b in range(nb):
            yield self._images[perm[b * batch_size : (b + 1) * batch_size][lo:hi]]


class PairedDataset:
    """Two unpaired domains zipped per batch — the CycleGAN Loader equivalent
    (cyclegan/data_loader.py:5-41). Epoch length = min(full batches of each)."""

    def __init__(self, ds_x, ds_y) -> None:
        self.ds_x = ds_x
        self.ds_y = ds_y

    def num_batches(self, batch_size: int) -> int:
        return min(
            self.ds_x.num_batches(batch_size, True),
            self.ds_y.num_batches(batch_size, True),
        )

    def epoch_batches(
        self, batch_size: int, epoch: int, rows: tuple[int, int] | None = None
    ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        it_x = self.ds_x.epoch_batches(batch_size, epoch, True, rows=rows)
        it_y = self.ds_y.epoch_batches(batch_size, epoch, True, rows=rows)
        for _ in range(self.num_batches(batch_size)):
            yield next(it_x), next(it_y)


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Background-thread prefetch (the AUTOTUNE-prefetch stand-in)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _SENTINEL = object()

    def _worker() -> None:
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=_worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        yield item


def normalize_on_device(x_uint8, dtype=None):
    """The Rescaling(1/127.5, -1) layer, to be called *inside* jitted steps."""
    import jax.numpy as jnp

    x = x_uint8.astype(dtype or jnp.float32)
    return x / 127.5 - 1.0
