"""ctypes binding for the native C++ ray-batch loader (native/ray_loader.cpp).

The native loader mmaps the reference-format 64-byte record dump
(``BinDataset.cs:40-49``) and serves SoA batches from a multi-threaded
prefetch ring — the TPU-native runtime equivalent of the reference's managed
``BinDataset`` (which does 1024 random 64 B file reads on the train thread
per batch, ``BinDataset.cs:27-52``).

Builds on demand (``make -C native``) the first time it is used; the pure
NumPy ``datasets.bin_dump.BinDataset`` remains the fallback when no C++
toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from nerf_or_nothing_tpu.rays import Rays

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libnonray.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native loader; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.rayloader_open.restype = ctypes.c_void_p
    lib.rayloader_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.rayloader_num_records.restype = ctypes.c_long
    lib.rayloader_num_records.argtypes = [ctypes.c_void_p]
    fp = ctypes.POINTER(ctypes.c_float)
    lib.rayloader_next.restype = ctypes.c_int
    lib.rayloader_next.argtypes = [ctypes.c_void_p] + [fp] * 8
    lib.rayloader_close.restype = None
    lib.rayloader_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


class NativeRayLoader:
    """Iterator of (Rays, pixels) batches backed by the C++ prefetch ring."""

    def __init__(
        self,
        path: str,
        batch_size: int,
        seed: int = 0,
        stripe_index: int = 0,
        stripe_count: int = 1,
        slots: int = 4,
        workers: int = 2,
    ):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native loader unavailable (build failed)")
        self._lib = lib
        self._batch = batch_size
        self._handle = lib.rayloader_open(
            path.encode(), batch_size, seed, stripe_index, stripe_count,
            slots, workers,
        )
        if not self._handle:
            raise FileNotFoundError(
                f"cannot open {path} (missing or not a 64-byte-record file)"
            )
        self.num_records = lib.rayloader_num_records(self._handle)

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[Rays, np.ndarray]:
        n = self._batch
        bufs = {
            "origins": np.empty((n, 3), np.float32),
            "directions": np.empty((n, 3), np.float32),
            "viewdirs": np.empty((n, 3), np.float32),
            "radii": np.empty((n, 1), np.float32),
            "near": np.empty((n, 1), np.float32),
            "far": np.empty((n, 1), np.float32),
            "loss_mult": np.empty((n, 1), np.float32),
            "pixels": np.empty((n, 3), np.float32),
        }
        fp = ctypes.POINTER(ctypes.c_float)
        rc = self._lib.rayloader_next(
            self._handle,
            *[bufs[k].ctypes.data_as(fp) for k in (
                "origins", "directions", "viewdirs", "radii", "near",
                "far", "loss_mult", "pixels")],
        )
        if rc != n:
            raise RuntimeError(f"rayloader_next returned {rc}")
        pixels = bufs.pop("pixels")
        return Rays(**bufs), pixels

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.rayloader_close(self._handle)
            self._handle = None

    def __del__(self):
        self.close()
