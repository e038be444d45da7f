"""Native (C++) runtime components, loaded via ctypes.

The only native piece the pipeline needs is the image decoder for the
vlen-PNG/JPEG HumanSloMo h5 (reference decodes per-frame with PIL at
``Pose_Guided_Neural_Rendering/datasets/HSM_auto_dataset.py:127-128``).
The extension is built lazily with ``g++`` on first use and cached next
to the source; if the toolchain or libpng/libjpeg headers are missing we
fall back to PIL transparently (``batch_decode`` works either way).
"""

from __future__ import annotations

import ctypes
import io
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "decoder.cpp")
_SO = os.path.join(_HERE, "_librldecode.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", _SRC,
           "-o", _SO, "-lpng", "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Return the decoder library, building it if needed; None if
    unavailable (no toolchain / headers)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.exists(_SRC) and
                                       os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.rl_decode_batch.restype = ctypes.c_int
        lib.rl_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.rl_image_dims.restype = ctypes.c_int
        lib.rl_image_dims.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load() is not None


def image_dims(buf: bytes) -> tuple:
    """(width, height) of a PNG/JPEG byte buffer without a full decode."""
    lib = load()
    if lib is not None:
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = lib.rl_image_dims(buf, len(buf), ctypes.byref(w),
                               ctypes.byref(h))
        if rc == 0:
            return w.value, h.value
    from PIL import Image
    with Image.open(io.BytesIO(buf)) as im:
        return im.size


def _pil_decode(buf: bytes) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))


def batch_decode(buffers: Sequence[bytes], height: int, width: int,
                 threads: Optional[int] = None) -> np.ndarray:
    """Decode PNG/JPEG byte buffers to one (n, height, width, 3) uint8
    array, in parallel via the C++ extension (PIL fallback)."""
    bufs: List[bytes] = [b.tobytes() if isinstance(b, np.ndarray) else
                         bytes(b) for b in buffers]
    n = len(bufs)
    out = np.empty((n, height, width, 3), dtype=np.uint8)
    if n == 0:
        return out
    lib = load()
    if lib is not None:
        ptrs = (ctypes.c_void_p * n)(
            *[ctypes.cast(ctypes.c_char_p(b), ctypes.c_void_p) for b in bufs])
        lens = (ctypes.c_size_t * n)(*[len(b) for b in bufs])
        if threads is None:
            threads = min(n, os.cpu_count() or 1)
        rc = lib.rl_decode_batch(
            ptrs, lens, n, out.ctypes.data_as(ctypes.c_void_p),
            height, width, threads)
        if rc == 0:
            return out
        idx, code = (-rc) // 16, (-rc) % 16
        if code == 3:
            raise ValueError(
                f"image {idx} decoded to unexpected dims "
                f"(want {height}x{width})")
        # corrupt / unknown format: fall through to PIL for a clearer error
    for i, b in enumerate(bufs):
        img = _pil_decode(b)
        if img.shape[:2] != (height, width):
            raise ValueError(f"image {i} has shape {img.shape}, "
                             f"want ({height}, {width}, 3)")
        out[i] = img
    return out
