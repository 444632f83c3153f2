"""ctypes bindings for the native host IO runtime (native/uvit_io.cpp).

Compiles the shared library on first use (g++ -O3, cached next to the
source, rebuilt when the source is newer) and exposes:
  - decode_jpeg_batch(paths, size, num_threads) → (batch u8 [N,S,S,3], ok [N])
  - assemble_batch(arrays, num_threads) → contiguous stacked array

All functions release the GIL for the duration of the native call (ctypes
default), so decode/assembly parallelism is real threads — the TPU-native
replacement for the reference's forked DataLoader workers. Callers must
handle `available() == False` (no toolchain / no libjpeg) by falling back to
the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "uvit_io.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libuvit_io.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17",
        "-o", _LIB, _SRC, "-ljpeg", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        needs_build = not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        )
        if needs_build and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.uvit_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.uvit_assemble_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.uvit_decode_batch_letterbox.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.uvit_io_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_jpeg_batch(
    paths: Sequence[str], size: int, num_threads: int = 8
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+resize+center-crop JPEGs into [N, size, size, 3] uint8.

    Returns (batch, ok) where ok[i] is False for corrupt/non-JPEG files
    (caller resamples those indices, dataset_folder.py:164-171 semantics).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO runtime unavailable")
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    statuses = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.uvit_decode_batch(
        c_paths, n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    return out, statuses == 0


def decode_jpeg_batch_letterbox(
    paths: Sequence[str], short_size: int, canvas: int, num_threads: int = 8
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Letterboxed decode: [N, canvas, canvas, 3] zero-filled squares with
    the aspect-preserving resize pasted top-left, plus per-image valid
    extents [N, 2] (h, w) — so the on-device RandomResizedCrop can sample
    the FULL image instead of a host center crop. Returns
    (batch, valid_hw, ok)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO runtime unavailable")
    n = len(paths)
    out = np.empty((n, canvas, canvas, 3), np.uint8)
    valid_hw = np.zeros((n, 2), np.int32)
    statuses = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.uvit_decode_batch_letterbox(
        c_paths, n, short_size, canvas,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        valid_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    return out, valid_hw, statuses == 0


def assemble_batch(arrays: List[np.ndarray], num_threads: int = 8) -> np.ndarray:
    """Parallel stack of equally-shaped contiguous arrays (np.stack without
    the GIL)."""
    lib = _load()
    if lib is None:
        return np.stack(arrays)
    n = len(arrays)
    first = np.ascontiguousarray(arrays[0])
    item_bytes = first.nbytes
    out = np.empty((n,) + first.shape, first.dtype)
    contig = [np.ascontiguousarray(a) for a in arrays]
    ptrs = (ctypes.c_void_p * n)(*[a.ctypes.data for a in contig])
    lib.uvit_assemble_batch(
        ptrs, n, item_bytes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads,
    )
    return out
