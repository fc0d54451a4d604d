"""ctypes bindings for the native frame-IO runtime (frameio.cpp).

Compiles the C++ on first use (g++ -O2 -lz, cached next to the source) and
degrades gracefully: every entry point has a PIL fallback, selected when the
toolchain or zlib is unavailable, or per-file when a PNG uses an unsupported
feature (palette, 16-bit, interlace) or the file is a JPEG.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "frameio.cpp"
_SO = _HERE / "_frameio.so"

_lib = None
_lib_lock = threading.Lock()
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if (not _SO.exists()
                    or _SO.stat().st_mtime < _SRC.stat().st_mtime):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     str(_SRC), "-o", str(_SO), "-lz", "-lpthread"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(str(_SO))
        except Exception as e:  # no toolchain / no zlib -> PIL fallback
            print(f"frameio native build unavailable ({e}); using PIL")
            _load_failed = True
            return None

        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.frameio_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(u8p),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32)]
        lib.frameio_decode.restype = ctypes.c_int
        lib.frameio_encode.argtypes = [
            ctypes.c_char_p, u8p, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_int]
        lib.frameio_encode.restype = ctypes.c_int
        lib.frameio_free.argtypes = [u8p]
        lib.frameio_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.frameio_loader_create.restype = ctypes.c_void_p
        lib.frameio_loader_get.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(u8p),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32)]
        lib.frameio_loader_get.restype = ctypes.c_int
        lib.frameio_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.frameio_writer_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.frameio_writer_create.restype = ctypes.c_void_p
        lib.frameio_writer_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, u8p, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_uint32]
        lib.frameio_writer_flush.argtypes = [ctypes.c_void_p]
        lib.frameio_writer_flush.restype = ctypes.c_int
        lib.frameio_writer_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _pil_decode(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if img.mode not in ("L", "LA", "RGB", "RGBA"):
        img = img.convert("RGB")
    arr = np.asarray(img)
    return arr if arr.ndim == 3 else arr[..., None]


def decode_png(path: str) -> np.ndarray:
    """Decode an image to uint8 (H, W, C); PIL fallback as needed."""
    lib = _load()
    if lib is None or not str(path).lower().endswith(".png"):
        return _pil_decode(str(path))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    pixels = u8p()
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    c = ctypes.c_uint32()
    rc = lib.frameio_decode(str(path).encode(), ctypes.byref(pixels),
                            ctypes.byref(w), ctypes.byref(h), ctypes.byref(c))
    if rc != 0:
        return _pil_decode(str(path))
    n = h.value * w.value * c.value
    arr = np.ctypeslib.as_array(pixels, shape=(n,)).reshape(
        h.value, w.value, c.value).copy()
    lib.frameio_free(pixels)
    return arr


def encode_png(path: str, array: np.ndarray, compress_level: int = 6) -> None:
    """Write uint8 (H, W[, C]) to PNG; PIL fallback as needed."""
    arr = np.ascontiguousarray(array, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    lib = _load()
    if lib is None or arr.shape[-1] not in (1, 3, 4) \
            or not str(path).lower().endswith(".png"):
        from PIL import Image

        Image.fromarray(array.squeeze()).save(path)
        return
    rc = lib.frameio_encode(
        str(path).encode(),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        arr.shape[1], arr.shape[0], arr.shape[-1], compress_level)
    if rc != 0:
        from PIL import Image

        Image.fromarray(array.squeeze()).save(path)


class FrameLoader:
    """In-order threaded frame prefetcher over a path list."""

    def __init__(self, paths: Sequence[str], num_threads: int = 4,
                 window: int = 8):
        self.paths: List[str] = [str(p) for p in paths]
        lib = _load()
        self._lib = lib
        self._handle = None
        if lib is not None and all(
                p.lower().endswith(".png") for p in self.paths):
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._handle = lib.frameio_loader_create(
                arr, len(self.paths), num_threads, window)

    def get(self, index: int) -> np.ndarray:
        if self._handle is not None:
            u8p = ctypes.POINTER(ctypes.c_uint8)
            pixels = u8p()
            w = ctypes.c_uint32()
            h = ctypes.c_uint32()
            c = ctypes.c_uint32()
            rc = self._lib.frameio_loader_get(
                self._handle, index, ctypes.byref(pixels), ctypes.byref(w),
                ctypes.byref(h), ctypes.byref(c))
            if rc == 0:
                n = h.value * w.value * c.value
                arr = np.ctypeslib.as_array(pixels, shape=(n,)).reshape(
                    h.value, w.value, c.value).copy()
                self._lib.frameio_free(pixels)
                return arr
        return _pil_decode(self.paths[index])

    def close(self) -> None:
        if self._handle is not None:
            self._lib.frameio_loader_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class FrameWriter:
    """Async threaded PNG writer (speed-biased compression for streaming)."""

    def __init__(self, num_threads: int = 2, compress_level: int = 1):
        lib = _load()
        self._lib = lib
        self._handle = (lib.frameio_writer_create(num_threads, compress_level)
                        if lib is not None else None)

    def submit(self, path: str, array: np.ndarray) -> None:
        arr = np.ascontiguousarray(array, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[..., None]
        if self._handle is not None and arr.shape[-1] in (1, 3, 4) \
                and str(path).lower().endswith(".png"):
            self._lib.frameio_writer_submit(
                self._handle, str(path).encode(),
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                arr.shape[1], arr.shape[0], arr.shape[-1])
        else:
            encode_png(path, array)

    def flush(self) -> int:
        if self._handle is not None:
            return self._lib.frameio_writer_flush(self._handle)
        return 0

    def close(self) -> None:
        if self._handle is not None:
            self.flush()
            self._lib.frameio_writer_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
