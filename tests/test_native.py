"""Native fastimage extension tests: build, decode correctness vs PIL/cv2."""

import io

import numpy as np
import pytest
from PIL import Image

from imagegeneration_tpu.ops.native import get_fastimage

fastimage = get_fastimage()

pytestmark = pytest.mark.skipif(
    fastimage is None, reason="native toolchain/libjpeg unavailable"
)


def _jpeg_bytes(arr: np.ndarray, quality: int = 95) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_jpeg_dims():
    arr = np.zeros((37, 53, 3), dtype=np.uint8)
    assert fastimage.jpeg_dims(_jpeg_bytes(arr)) == (37, 53)


def test_decode_resize_matches_pil_pipeline():
    rng = np.random.default_rng(0)
    # smooth image so codec/resampler differences stay tiny
    base = rng.normal(128, 20, (10, 16, 3))
    arr = np.kron(base, np.ones((12, 12, 1))).astype(np.uint8)  # 120x192
    data = _jpeg_bytes(arr, quality=98)

    th, tw = 48, 80
    raw = fastimage.decode_resize_jpeg(data, th, tw, True)
    got = np.frombuffer(raw, dtype=np.uint8).reshape(th, tw, 3).astype(np.int32)

    # reference pipeline: PIL decode -> same center-crop math -> PIL bilinear
    with Image.open(io.BytesIO(data)) as im:
        ref = np.asarray(im.convert("RGB"))
    h, w = ref.shape[:2]
    if h * tw > w * th:
        ch = (w * th) // tw
        top = (h - ch) // 2
        ref = ref[top : top + ch]
    else:
        cw = (h * tw) // th
        left = (w - cw) // 2
        ref = ref[:, left : left + cw]
    ref = np.asarray(
        Image.fromarray(ref).resize((tw, th), Image.BILINEAR)
    ).astype(np.int32)

    assert got.shape == ref.shape
    assert np.mean(np.abs(got - ref)) < 3.0  # resampler LSB differences only


def test_decode_no_crop_exact_size():
    arr = (np.indices((32, 32)).sum(0) % 256).astype(np.uint8)
    arr = np.stack([arr] * 3, axis=-1)
    data = _jpeg_bytes(arr, quality=100)
    raw = fastimage.decode_resize_jpeg(data, 32, 32, False)
    got = np.frombuffer(raw, dtype=np.uint8).reshape(32, 32, 3)
    assert np.mean(np.abs(got.astype(int) - arr.astype(int))) < 2.0


def test_corrupt_jpeg_raises():
    with pytest.raises(ValueError):
        fastimage.decode_resize_jpeg(b"not a jpeg at all", 8, 8, True)


def test_load_image_uses_native_path(tmp_path):
    from imagegeneration_tpu.core.data import load_image

    arr = np.full((100, 200, 3), 200, dtype=np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(arr).save(p, quality=95)
    out = load_image(p, (50, 50))
    assert out.shape == (50, 50, 3)
    assert abs(float(out.mean()) - 200) < 3


def test_dct_prescale_large_source():
    """A big source decodes through the 1/2^k prescale path correctly."""
    rng = np.random.default_rng(1)
    base = rng.normal(100, 30, (8, 8, 3))
    arr = np.kron(base, np.ones((128, 128, 1))).astype(np.uint8)  # 1024x1024
    data = _jpeg_bytes(arr, quality=95)
    raw = fastimage.decode_resize_jpeg(data, 64, 64, True)
    got = np.frombuffer(raw, dtype=np.uint8).reshape(64, 64, 3)
    ref = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize((64, 64), Image.BILINEAR)
    )
    assert np.mean(np.abs(got.astype(int) - ref.astype(int))) < 4.0
