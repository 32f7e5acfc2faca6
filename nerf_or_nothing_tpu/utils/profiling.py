"""Tracing / profiling / roofline utilities (SURVEY.md §5.1).

The reference has no tracing at all — just printf-after-sync smoke checks
(``AcceleratedMipNeRF.cpp:97-141``) and a training loop serialized by
``cudaDeviceSynchronize`` after every kernel launch. Here:

- ``trace()``: context manager around ``jax.profiler`` producing an XProf /
  TensorBoard trace directory;
- ``timed()``: wall-clock timing with *forced materialization* — on
  tunneled/experimental PJRT platforms ``block_until_ready`` can return
  before execution finishes, so syncing must go through a host copy;
- ``mlp_roofline()``: the explicit FLOPs/bytes model for the fused MLP the
  "speed-of-light" target is measured against (BASELINE.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Tuple

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA op-level trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force completion by materializing one leaf on the host."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(leaves[0])


def timed(fn: Callable, *args, iters: int = 20, warmup: int = 2) -> float:
    """Mean seconds per call, sync'd by materialization (not
    block_until_ready — see module docstring)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


# Known per-chip peak dense bf16 FLOP/s and HBM bytes/s.
CHIP_PEAKS = {
    "TPU v5 lite": (197e12, 819e9),
    "TPU v4": (275e12, 1228e9),
    "TPU v6 lite": (918e12, 1640e9),
}


def chip_peaks(device=None) -> Tuple[float, float]:
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    for prefix, peaks in CHIP_PEAKS.items():
        if kind.startswith(prefix):
            return peaks
    return (1e11, 1e10)  # conservative CPU-ish fallback


def mlp_roofline(cfg, num_rows: int, backward: bool = True) -> dict:
    """FLOPs / bytes / time lower bound for the fused MLP on this chip.

    num_rows = rays * samples (one level). Bytes counted: inputs (IPE
    features + dir features) + outputs + one pass over the parameters —
    activations stay in VMEM by design.
    """
    from nerf_or_nothing_tpu.models.mlp import layer_dims

    dims = layer_dims(cfg)
    matmul_flops = 2 * sum(i * o for i, o in dims) * num_rows
    total_flops = matmul_flops * (3 if backward else 1)
    param_bytes = sum(i * o + o for i, o in dims) * 4
    io_bytes = num_rows * (
        (cfg.location_features + cfg.direction_features) * 4  # inputs
        + 4 * 4                                               # rgb+sigma out
    ) * (2 if backward else 1) + param_bytes
    peak_flops, peak_bw = chip_peaks()
    t_compute = total_flops / peak_flops
    t_memory = io_bytes / peak_bw
    return {
        "flops": total_flops,
        "bytes": io_bytes,
        "t_compute_s": t_compute,
        "t_memory_s": t_memory,
        "t_roofline_s": max(t_compute, t_memory),
        "compute_bound": t_compute >= t_memory,
    }
