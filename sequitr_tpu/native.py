"""ctypes loader for the native C++ runtime helpers (``csrc/seqnative.cpp``).

Builds on demand with g++ (cached as ``csrc/libseqnative.so``); every entry
point has a pure-Python/scipy fallback, so the framework works without a
toolchain — the native path is a host-side throughput optimization for
connected-component labelling and TFRecord crc32c (SURVEY.md §2 'Native
compute layer': the rebuild's device-native layer is XLA/Pallas; this covers
the host hot loops).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csrc", "seqnative.cpp")
_LIB = os.path.join(_HERE, "csrc", "libseqnative.so")

_lib: Optional[ctypes.CDLL] = None
_lock = threading.Lock()
_build_failed = False

__all__ = ["available", "build", "label_components", "label_stats", "crc32c"]


def build(force: bool = False) -> bool:
    """Compile the native library with g++. Returns True on success."""
    global _build_failed
    if os.path.exists(_LIB) and not force:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        _build_failed = True
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) and not build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.seq_label_components.restype = ctypes.c_int32
        lib.seq_label_components.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.seq_label_stats.restype = None
        lib.seq_label_stats.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.seq_crc32c.restype = ctypes.c_uint32
        lib.seq_crc32c.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def label_components(mask: np.ndarray) -> np.ndarray:
    """4-connected components of a 2D boolean mask -> int32 labels (1..n)."""
    lib = _load()
    mask = np.ascontiguousarray(np.asarray(mask, dtype=np.uint8))
    h, w = mask.shape
    out = np.empty((h, w), dtype=np.int32)
    if lib is None:
        from scipy import ndimage

        labelled, _ = ndimage.label(mask)
        return labelled.astype(np.int32)
    lib.seq_label_components(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def label_stats(labels: np.ndarray, n_labels: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-label (areas, centroid_y, centroid_x) for labels 1..n_labels."""
    lib = _load()
    labels = np.ascontiguousarray(np.asarray(labels, dtype=np.int32))
    h, w = labels.shape
    if lib is None:
        from scipy import ndimage

        ids = np.arange(1, n_labels + 1)
        areas = ndimage.sum_labels(np.ones_like(labels), labels, ids).astype(np.int64)
        if n_labels:
            com = ndimage.center_of_mass(np.ones_like(labels), labels, ids)
            cy = np.asarray([c[0] for c in com])
            cx = np.asarray([c[1] for c in com])
        else:
            cy = cx = np.zeros(0)
        return areas, cy, cx
    areas = np.zeros(n_labels, dtype=np.int64)
    cy = np.zeros(n_labels, dtype=np.float64)
    cx = np.zeros(n_labels, dtype=np.float64)
    lib.seq_label_stats(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        h,
        w,
        n_labels,
        areas.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cx.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return areas, cy, cx


def crc32c(data: bytes) -> int:
    """Castagnoli CRC of ``data`` (native slice-by-8; Python fallback)."""
    lib = _load()
    if lib is None:
        from sequitr_tpu.data.records import crc32c as py_crc

        return py_crc(data)
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    return int(lib.seq_crc32c(buf, len(data)))
