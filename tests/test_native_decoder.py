"""Native C++ batch image decoder: PIL parity + error handling.

The decoder replaces the reference's per-frame PIL decode of the
vlen-PNG h5 (``HSM_auto_dataset.py:127-128``) with one multithreaded
libpng/libjpeg call (``renderloom/native/decoder.cpp``).
"""

import io

import numpy as np
import pytest
from PIL import Image

from renderloom import native


def _encode(img, fmt):
    b = io.BytesIO()
    Image.fromarray(img).save(b, format=fmt, quality=95)
    return b.getvalue()


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (8, 40, 56, 3), dtype=np.uint8)


def test_png_roundtrip_exact(images):
    bufs = [_encode(im, "PNG") for im in images]
    out = native.batch_decode(bufs, 40, 56)
    np.testing.assert_array_equal(out, images)


def test_jpeg_matches_pil(images):
    bufs = [_encode(im, "JPEG") for im in images]
    out = native.batch_decode(bufs, 40, 56)
    pil = np.stack([np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
                    for b in bufs])
    np.testing.assert_array_equal(out, pil)


def test_mixed_formats_and_threads(images):
    bufs = [_encode(im, "PNG" if i % 2 else "JPEG")
            for i, im in enumerate(images)]
    out1 = native.batch_decode(bufs, 40, 56, threads=1)
    out8 = native.batch_decode(bufs, 40, 56, threads=8)
    np.testing.assert_array_equal(out1, out8)


def test_image_dims(images):
    assert native.image_dims(_encode(images[0], "PNG")) == (56, 40)
    assert native.image_dims(_encode(images[0], "JPEG")) == (56, 40)


def test_wrong_dims_raises(images):
    bufs = [_encode(images[0], "PNG")]
    with pytest.raises(ValueError):
        native.batch_decode(bufs, 41, 56)


def test_grayscale_and_palette_promote_to_rgb():
    gray = Image.fromarray(
        (np.arange(32 * 32) % 256).astype(np.uint8).reshape(32, 32), "L")
    pal = gray.convert("P")
    bufs = []
    for im in (gray, pal):
        b = io.BytesIO()
        im.save(b, format="PNG")
        bufs.append(b.getvalue())
    out = native.batch_decode(bufs, 32, 32)
    ref = np.stack([np.asarray(gray.convert("RGB")),
                    np.asarray(pal.convert("RGB"))])
    np.testing.assert_array_equal(out, ref)


def test_empty_batch():
    assert native.batch_decode([], 8, 8).shape == (0, 8, 8, 3)
