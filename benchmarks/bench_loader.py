"""Data-loader throughput: native C++ prefetch ring vs NumPy gathers.

Measures batches/s for the reference-format 64-byte-record ray dump
(``BinDataset.cs:40-49``) served by (a) the native loader
(``native/ray_loader.cpp``: mmap + Lemire-bounded PRNG + prefetch ring) and
(b) the NumPy memmap+fancy-index fallback — both through the public
``create_dataset(BIN)`` factory. Prints one JSON line per variant plus the
speedup. The reference's own loader issues 1024 random 64 B file reads on
the train thread per batch (``BinDataset.cs:27-52``); both paths here are
orders of magnitude faster — this bench guards the native integration.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_records: int = 1_000_000, batch_size: int = 1024,
         n_batches: int = 500) -> None:
    from nerf_or_nothing_tpu.config import Config, DatasetType
    from nerf_or_nothing_tpu.datasets import bin_dump
    from nerf_or_nothing_tpu.datasets.base import create_dataset
    from nerf_or_nothing_tpu.rays import Rays

    rng = np.random.default_rng(0)
    d = rng.normal(size=(n_records, 3)).astype(np.float32)
    ones = np.ones((n_records, 1), np.float32)
    rays = Rays(
        rng.normal(size=(n_records, 3)).astype(np.float32), d,
        (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32),
        ones * 0.005, ones * 2.0, ones * 6.0, ones,
    )
    pixels = rng.uniform(size=(n_records, 3)).astype(np.float32)

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "rays.bin")
        bin_dump.write_bin_dump(path, rays, pixels)
        cfg = Config(dataset_loader=DatasetType.BIN, batch_size=batch_size)

        results = {}
        for name, use_native in (("native", True), ("numpy", False)):
            bin_dump.USE_NATIVE = use_native
            ds = create_dataset("train", path, cfg)
            if use_native and ds._native is None:
                print(json.dumps({"metric": "loader_batches_per_sec",
                                  "variant": "native",
                                  "value": None,
                                  "note": "native build unavailable"}))
                continue
            for _ in range(20):  # warm the ring / page cache
                next(ds)
            t0 = time.perf_counter()
            for _ in range(n_batches):
                next(ds)
            dt = time.perf_counter() - t0
            results[name] = n_batches / dt
            print(json.dumps({
                "metric": "loader_batches_per_sec",
                "variant": name,
                "value": round(results[name], 1),
                "unit": f"batches/s (batch={batch_size})",
            }))
        if "native" in results and "numpy" in results:
            print(json.dumps({
                "metric": "loader_native_speedup",
                "value": round(results["native"] / results["numpy"], 2),
                "unit": "x vs numpy",
            }))


if __name__ == "__main__":
    main()
