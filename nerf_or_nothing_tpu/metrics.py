"""Training statistics and logging.

Working equivalent of the reference ``StatsUtil`` (``ScratchNerf/
StatsUtil.cs:9-19``) — every field the reference declares (loss, per-level
losses, weightL2, psnr, psnrs, gradNorm, gradAbsMax, gradNormClipped) is
actually populated here every step (the reference never fills psnr/gradNorm),
plus learning rate and throughput. CSV and stdout writers; TensorBoard is
optional (gated on availability, no hard dependency).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Any, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class Stats(NamedTuple):
    """Per-step scalars (StatsUtil.cs:9-19, all populated)."""

    loss: jnp.ndarray
    losses: jnp.ndarray            # per level
    weight_l2: jnp.ndarray
    psnr: jnp.ndarray
    psnrs: jnp.ndarray             # per level
    grad_norm: jnp.ndarray
    grad_abs_max: jnp.ndarray
    grad_norm_clipped: jnp.ndarray
    learning_rate: jnp.ndarray


class MetricsLogger:
    """CSV + stdout + (optional) TensorBoard metrics writer with rays/s
    throughput tracking.

    TensorBoard events are written when a SummaryWriter implementation is
    importable (``torch.utils.tensorboard`` in this image); otherwise the
    logger silently degrades to CSV + stdout — no hard dependency.
    """

    def __init__(self, log_dir: Optional[str] = None, batch_size: int = 0,
                 tensorboard: bool = True):
        self._csv_writer = None
        self._csv_file = None
        self._tb = None
        self._batch_size = batch_size
        self._last_time: Optional[float] = None
        self._last_step: int = 0
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._csv_file = open(
                os.path.join(log_dir, "train_stats.csv"), "a", newline=""
            )
            self._csv_writer = csv.writer(self._csv_file)
            if self._csv_file.tell() == 0:
                self._csv_writer.writerow(
                    ["step", "loss", "psnr", "grad_norm", "grad_abs_max",
                     "grad_norm_clipped", "weight_l2", "lr", "rays_per_sec"]
                )
            if tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
                except Exception:
                    self._tb = None

    def log(self, step: int, stats: Stats, quiet: bool = False) -> dict:
        now = time.perf_counter()
        rays_per_sec = 0.0
        if self._last_time is not None and step > self._last_step:
            rays_per_sec = (
                (step - self._last_step) * self._batch_size
                / (now - self._last_time)
            )
        self._last_time = now
        self._last_step = step

        row = {
            "step": step,
            "loss": float(stats.loss),
            "psnr": float(stats.psnr),
            "grad_norm": float(stats.grad_norm),
            "grad_abs_max": float(stats.grad_abs_max),
            "grad_norm_clipped": float(stats.grad_norm_clipped),
            "weight_l2": float(stats.weight_l2),
            "lr": float(stats.learning_rate),
            "rays_per_sec": rays_per_sec,
        }
        if self._csv_writer is not None:
            self._csv_writer.writerow(list(row.values()))
            self._csv_file.flush()
        if self._tb is not None:
            for k, v in row.items():
                if k != "step":
                    self._tb.add_scalar(f"train/{k}", v, step)
            for lvl, l in enumerate(np.asarray(stats.losses)):
                self._tb.add_scalar(f"train/loss_level{lvl}", float(l), step)
        if not quiet:
            losses = np.asarray(stats.losses)
            per_level = "/".join(f"{l:.5f}" for l in losses)
            print(
                f"step {step:>7d}  loss {row['loss']:.5f} ({per_level})  "
                f"psnr {row['psnr']:.2f}  |g| {row['grad_norm']:.3f}  "
                f"lr {row['lr']:.2e}  {rays_per_sec:,.0f} rays/s",
                flush=True,
            )
        return row

    def close(self):
        if self._csv_file is not None:
            self._csv_file.close()
        if self._tb is not None:
            self._tb.close()
