"""Dataset framework: load renderings -> generate rays -> batch iterator.

TPU-native equivalent of the reference framework (``ScratchNerf/Dataset.cs``):
``Dataset.TrainInit`` (LoadRenderings -> GenerateRays -> pixel decode,
Dataset.cs:76-106), the random-pixel batch sampler (``NextTrain``,
Dataset.cs:187-200 — with its incoherent collision-remap replaced by a plain
with-replacement draw from a seeded PRNG), the one-batch ``Peek``/``Next``
lookahead (Dataset.cs:177-184) generalized to a background prefetch thread,
and ``DatasetFactory.CreateDataset`` (Dataset.cs:18-30).

``TestInit`` — which *throws* in the reference (Dataset.cs:107-110) — is
implemented: test split yields per-image ray grids for full-image eval.

Multi-host sharding: each process draws from its own ``process_index`` stripe
of the pixel pool, so a pod slice trains on disjoint rays without any
cross-host coordination (SURVEY.md §5.8).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

from nerf_or_nothing_tpu.config import Config, DatasetType
from nerf_or_nothing_tpu.rays import Rays


class RayBatch(Tuple):
    pass


class Dataset:
    """Base dataset: subclasses fill ``self.images`` [N,H,W,3] float32 in
    [0,1] and ``self.rays`` (Rays with leaves [N,H,W,C]) in ``_load``."""

    def __init__(self, split: str, data_dir: str, cfg: Config):
        self.split = split
        self.data_dir = data_dir
        self.cfg = cfg
        self.images: np.ndarray = None  # [N, H, W, 3]
        self.rays: Rays = None          # leaves [N, H, W, C]
        self._load()
        if cfg.linear_color:
            self._linearize()
        self._flatten()
        self._rng = np.random.default_rng(
            cfg.seed + 17 * jax.process_index() + (0 if split == "train" else 1)
        )
        self._queue: "queue.Queue" = queue.Queue(maxsize=4)
        self._thread: Optional[threading.Thread] = None
        self._peeked: Optional[Tuple[Rays, np.ndarray]] = None
        self._stop = threading.Event()

    # -- subclass API -------------------------------------------------------
    def _load(self) -> None:
        raise NotImplementedError

    def _linearize(self) -> None:
        """Train in linear radiance (Config.linear_color): decode the
        sRGB-encoded pixels at load; ``eval.to_display`` re-encodes on the
        way out. Subclasses with extra pixel stores extend this."""
        from nerf_or_nothing_tpu.ops.math_utils import srgb_to_linear

        self.images = np.asarray(srgb_to_linear(self.images), np.float32)

    # -- internals ----------------------------------------------------------
    def _flatten(self) -> None:
        """Flatten [N,H,W,...] to a pixel pool, striped across hosts."""
        n, h, w = self.images.shape[:3]
        self.num_images, self.height, self.width = n, h, w
        flat_rays = Rays(*[np.asarray(x).reshape(n * h * w, -1)
                           for x in self.rays])
        flat_pixels = self.images.reshape(n * h * w, 3)
        # Per-host stripe (process p takes indices p, p+P, p+2P, ...).
        p, num_p = jax.process_index(), jax.process_count()
        if num_p > 1:
            flat_rays = Rays(*[x[p::num_p] for x in flat_rays])
            flat_pixels = flat_pixels[p::num_p]
        self._flat_rays = flat_rays
        self._flat_pixels = flat_pixels
        self.pool_size = flat_pixels.shape[0]

    def _sample_batch(self) -> Tuple[Rays, np.ndarray]:
        idx = self._rng.integers(0, self.pool_size, size=(self.cfg.batch_size,))
        rays = Rays(*[x[idx] for x in self._flat_rays])
        return rays, self._flat_pixels[idx]

    # -- public API ---------------------------------------------------------
    def __iter__(self) -> Iterator[Tuple[Rays, np.ndarray]]:
        return self

    def __next__(self) -> Tuple[Rays, np.ndarray]:
        """Next training batch, produced by a background prefetch thread
        (the reference's Peek/Next one-batch lookahead, BinDataset.cs:17-25,
        generalized)."""
        if self._peeked is not None:
            batch, self._peeked = self._peeked, None
            return batch
        if self._thread is None:
            if self._stop.is_set():
                raise RuntimeError("dataset is closed")
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
        return self._queue.get()

    def _worker(self) -> None:
        # Bounded-put loop so ``close()`` can always join: a plain blocking
        # ``queue.put`` would deadlock the worker against a consumer that
        # has already exited (the round-3 latent interpreter-exit flake).
        while not self._stop.is_set():
            batch = self._sample_batch()
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def close(self) -> None:
        """Stop the prefetch worker and join it (idempotent).

        Call at the end of train/eval; ``__exit__`` and ``__del__`` call it
        too, so abandoned datasets cannot leak a blocked daemon thread."""
        self._stop.set()
        thread, self._thread = self._thread, None
        if thread is not None:
            thread.join(timeout=5.0)

    def __enter__(self) -> "Dataset":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self) -> None:
        try:
            self.close()
        except Exception:
            pass  # interpreter teardown: modules may already be gone

    def peek(self) -> Tuple[Rays, np.ndarray]:
        """The batch ``__next__`` will return, without consuming it.

        Before the prefetch worker starts, this draws with RNG save/restore
        (single-threaded, race-free). Once the worker is running, the RNG is
        owned by the worker thread, so peek instead takes the next queued
        batch and stashes it for ``__next__`` — never touching ``_rng``
        concurrently (that save/restore raced ``_sample_batch`` before)."""
        if self._peeked is not None:
            return self._peeked
        if self._thread is None:
            rng_state = self._rng.bit_generator.state
            batch = self._sample_batch()
            self._rng.bit_generator.state = rng_state
            return batch
        self._peeked = self._queue.get()
        return self._peeked

    def image_rays(self, index: int) -> Tuple[Rays, np.ndarray]:
        """Full ray grid + ground truth for one image (test/eval split)."""
        rays = Rays(*[np.asarray(x[index]).reshape(-1, x.shape[-1])
                      for x in self.rays])
        return rays, self.images[index].reshape(-1, 3)

    def image_dims(self, index: int) -> Tuple[int, int]:
        """(height, width) of image ``index``; uniform by default, overridden
        by mixed-resolution datasets (Multicam)."""
        return self.height, self.width


def create_dataset(split: str, data_dir: str, cfg: Config) -> Dataset:
    """DatasetFactory.CreateDataset (Dataset.cs:18-30)."""
    from nerf_or_nothing_tpu.datasets import bin_dump, blender, llff, multicam

    loaders = {
        DatasetType.BLENDER: blender.Blender,
        DatasetType.LLFF: llff.LLFF,
        DatasetType.MULTICAM: multicam.Multicam,
        DatasetType.BIN: bin_dump.BinDataset,
    }
    return loaders[cfg.dataset_loader](split, data_dir, cfg)
