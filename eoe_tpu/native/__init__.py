"""ctypes binding for the native batch image decoder (loader.cpp).

The shared library is built lazily on first use (g++ -O3 against the system
libjpeg/libpng) and cached next to the source; everything degrades gracefully
to the PIL path in :mod:`eoe_tpu.datasets.folder` when the toolchain or the
libraries are unavailable, or per-image on decode failure.

Disable with EOE_TPU_NATIVE=0.
"""

import ctypes
import os
import os.path as pt
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = pt.dirname(pt.abspath(__file__))
_SRC = pt.join(_HERE, "loader.cpp")
_SO = pt.join(_HERE, "_loader.so")

_lib = None
_lock = threading.Lock()
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
           "-ljpeg", "-lpng", "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it on first call; None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("EOE_TPU_NATIVE", "1") == "0":
            return None
        if not pt.exists(_SO) or pt.getmtime(_SO) < pt.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.eoe_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
            lib.eoe_loader_version.restype = ctypes.c_int
            assert lib.eoe_loader_version() == 1
            _lib = lib
        except (OSError, AssertionError):
            _lib = None
        return _lib


def decode_batch(paths: List[str], hw, channels: int, n_threads: int = 16
                 ) -> Optional[np.ndarray]:
    """Decode a batch into (n, h, w, c) uint8. Returns None when the native
    path is unavailable. Failed images carry a -1 marker in out[..0,0,0] via
    the returned status mask instead; see decode_batch_with_status."""
    out, status = decode_batch_with_status(paths, hw, channels, n_threads)
    if out is None or status is None:
        return None
    if status.any():
        return None  # caller handles per-image retry via the PIL path
    return out


def decode_batch_with_status(paths: List[str], hw, channels: int, n_threads: int = 16):
    lib = get_lib()
    if lib is None:
        return None, None
    n = len(paths)
    out = np.empty((n, hw[0], hw[1], channels), dtype=np.uint8)
    status = np.zeros(n, dtype=np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.eoe_decode_batch(
        c_paths, n, hw[0], hw[1], channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads, status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out, status
