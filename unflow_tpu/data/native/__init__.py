"""ctypes bindings for the native C++ decode sidecar.

Mirrors the reference's compile-on-import pattern
(``src/e2eflow/ops.py`` builds its CUDA .so with nvcc on first import):
the shared library is built with g++ on first use and cached next to the
source. Falls back cleanly (``AVAILABLE = False``) when no toolchain is
present; the pure-Python codecs in unflow_tpu/data/{io,png16}.py are the
behavioral reference.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "loader.cc"
_LIB = _DIR / "libunflow_loader.so"
_LOCK = threading.Lock()
_lib = None
AVAILABLE = None  # resolved lazily


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC",
        "-std=c++17", str(_SRC), "-lz", "-o", str(_LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, AVAILABLE
    with _LOCK:
        if AVAILABLE is not None:
            return _lib
        # <= : an mtime TIE (e.g. both files written by one checkout)
        # must rebuild — loading a binary of unknown provenance risks
        # stale code or a foreign -march=native build (SIGILL).
        if not _LIB.exists() or _LIB.stat().st_mtime <= _SRC.stat().st_mtime:
            if not _build():
                AVAILABLE = False
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            AVAILABLE = False
            return None
        lib.unflow_png_shape.argtypes = [ctypes.c_char_p] + [
            ctypes.POINTER(ctypes.c_int)
        ] * 4
        lib.unflow_png_shape.restype = ctypes.c_int
        lib.unflow_decode_rgb.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.unflow_decode_rgb.restype = ctypes.c_int
        lib.unflow_decode_kitti_flow.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.unflow_decode_kitti_flow.restype = ctypes.c_int
        lib.unflow_decode_rgb_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.unflow_decode_rgb_batch.restype = ctypes.c_int
        _lib = lib
        AVAILABLE = True
        return _lib


def available() -> bool:
    _load()
    return bool(AVAILABLE)


def png_shape(path: str) -> tuple[int, int, int, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    b = ctypes.c_int()
    rc = lib.unflow_png_shape(str(path).encode(), h, w, c, b)
    if rc:
        raise ValueError(f"native png_shape failed ({rc}): {path}")
    return h.value, w.value, c.value, b.value


def decode_rgb(path: str) -> np.ndarray:
    """Decode an 8-bit PNG to float32 RGB [0,1], (H, W, 3)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h, w, _, depth = png_shape(path)
    if depth != 8:
        raise ValueError(f"{path}: 16-bit image; use decode_kitti_flow")
    out = np.empty((h, w, 3), np.float32)
    rc = lib.unflow_decode_rgb(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w,
    )
    if rc:
        raise ValueError(f"native decode_rgb failed ({rc}): {path}")
    return out


def decode_kitti_flow(path: str) -> tuple[np.ndarray, np.ndarray]:
    """KITTI 16-bit flow PNG -> ((H, W, 2) flow, (H, W, 1) valid)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h, w, _, depth = png_shape(path)
    if depth != 16:
        raise ValueError(f"{path}: not a 16-bit PNG")
    flow = np.empty((h, w, 2), np.float32)
    valid = np.empty((h, w, 1), np.float32)
    rc = lib.unflow_decode_kitti_flow(
        str(path).encode(),
        flow.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w,
    )
    if rc:
        raise ValueError(f"native decode_kitti_flow failed ({rc}): {path}")
    return flow, valid


def decode_rgb_batch(paths: list[str], h: int, w: int, num_threads: int = 0) -> np.ndarray:
    """Parallel-decode same-sized 8-bit PNGs -> (N, H, W, 3) float32.

    Releases the GIL for the whole batch (ctypes); decoding threads are
    C++ std::threads — the rebuild's equivalent of the reference's
    queue-runner reader threads.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, h, w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    rc = lib.unflow_decode_rgb_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, num_threads,
    )
    if rc:
        raise ValueError(f"native batch decode failed ({rc})")
    return out
