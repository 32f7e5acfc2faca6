"""Preprocessed binary ray-dump dataset (the reference's live data path).

Byte-compatible with ``ScratchNerf/BinDataset.cs``: a file of 64-byte records,
each 16 little-endian float32s — origin(3), direction(3), viewdir(3), radius,
near, far, lossMult, pixel RGB(3) (``BinDataset.cs:40-49``).

Unlike the reference — which opens the file and issues 1024 random 64-byte
reads per batch (``BinDataset.cs:27-52``, I/O-bound by design) — the whole
file is memory-mapped once and batches are vectorized gathers; sampling is
with replacement from a seeded PRNG, matching the reference's distribution.

Training batches are served by the native C++ loader
(``native/ray_loader.cpp``: mmap + multithreaded prefetch ring) when its
shared library builds; the NumPy gather path is the fallback and remains
the source of truth for ``peek``/eval (deterministic, PRNG-seeded).
"""

from __future__ import annotations

import numpy as np

from nerf_or_nothing_tpu.datasets.base import Dataset
from nerf_or_nothing_tpu.rays import Rays

RECORD_FLOATS = 16  # 64 bytes

# Module-level switch so tests/benchmarks can force the NumPy path.
USE_NATIVE = True


class BinDataset(Dataset):
    def _load(self) -> None:
        data = np.memmap(self.data_dir, dtype="<f4", mode="r")
        if data.size % RECORD_FLOATS:
            raise ValueError(
                f"{self.data_dir}: size {data.size * 4} bytes is not a "
                f"multiple of the 64-byte record"
            )
        records = data.reshape(-1, RECORD_FLOATS)
        n = records.shape[0]
        # Expose the pool as a single 1 x N x 1 "image" so the base-class
        # flatten/stripe/batch machinery applies unchanged.
        self.images = np.asarray(records[:, 13:16]).reshape(1, n, 1, 3)
        self.rays = Rays(
            origins=np.asarray(records[:, 0:3]).reshape(1, n, 1, 3),
            directions=np.asarray(records[:, 3:6]).reshape(1, n, 1, 3),
            viewdirs=np.asarray(records[:, 6:9]).reshape(1, n, 1, 3),
            radii=np.asarray(records[:, 9:10]).reshape(1, n, 1, 1),
            near=np.asarray(records[:, 10:11]).reshape(1, n, 1, 1),
            far=np.asarray(records[:, 11:12]).reshape(1, n, 1, 1),
            loss_mult=np.asarray(records[:, 12:13]).reshape(1, n, 1, 1),
        )
        self._native = None
        if USE_NATIVE and self.split == "train":
            self._native = self._open_native()

    def _open_native(self):
        """C++ prefetch-ring loader for train batches; None -> NumPy path."""
        import jax

        from nerf_or_nothing_tpu.datasets.native_loader import (
            NativeRayLoader,
            native_available,
        )

        if not native_available():
            return None
        try:
            return NativeRayLoader(
                self.data_dir,
                self.cfg.batch_size,
                seed=self.cfg.seed,
                stripe_index=jax.process_index(),
                stripe_count=jax.process_count(),
            )
        except Exception:
            return None

    def __next__(self):
        if self._native is not None:
            # The native ring prefetches on its own worker threads; the
            # Python prefetch thread of the base class is bypassed.
            return next(self._native)
        return super().__next__()


def write_bin_dump(path: str, rays: Rays, pixels: np.ndarray) -> None:
    """Export rays+pixels in the reference's 64-byte record format."""
    n = pixels.shape[0]
    rec = np.zeros((n, RECORD_FLOATS), dtype="<f4")
    rec[:, 0:3] = np.asarray(rays.origins).reshape(n, 3)
    rec[:, 3:6] = np.asarray(rays.directions).reshape(n, 3)
    rec[:, 6:9] = np.asarray(rays.viewdirs).reshape(n, 3)
    rec[:, 9] = np.asarray(rays.radii).reshape(n)
    rec[:, 10] = np.asarray(rays.near).reshape(n)
    rec[:, 11] = np.asarray(rays.far).reshape(n)
    rec[:, 12] = np.asarray(rays.loss_mult).reshape(n)
    rec[:, 13:16] = np.asarray(pixels).reshape(n, 3)
    rec.tofile(path)
