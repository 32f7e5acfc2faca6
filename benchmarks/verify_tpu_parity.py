"""On-chip numerics gate: compiled Mosaic kernels vs the jax.grad oracle.

The interpret-mode tests (tests/test_kernels_*.py) pin the kernel MATH on
CPU with tiny tiles; this script proves the COMPILED lowering on the real
TPU at flagship shapes (full 8x256 model, S=128, tile=2048 — shapes the
tiny-tile tests cannot lower on hardware). Oracle/inputs/bands are shared
with tests/test_tpu_parity.py via ``nerf_or_nothing_tpu.utils.parity``.

For each compute dtype it reports the worst normalized error (fraction of
the ``atol + rtol*|b| + rtol*max|b|`` band consumed; <1 passes), the
MARGIN (1 - worst), the tensor holding the worst error, and — for f32 —
an ATTRIBUTION: the same comparison against the oracle recomputed at
``highest`` matmul precision (f32 via bf16x6 passes). If the error
against the high-precision oracle is much lower, the band consumption is
the ORACLE's own bf16x3 f32-on-TPU matmuls, not kernel error.

Usage:  python benchmarks/verify_tpu_parity.py
Prints one JSON line {"ok": true, ...} and exits nonzero on mismatch.
Reference intent: the reference's only verification device is "the same
math implemented twice" (C# path vs CUDA path, SURVEY.md §4); this is
that idea made executable on the production hardware.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from nerf_or_nothing_tpu.utils.parity import (
        PARITY_BANDS,
        level_parity_errors,
    )

    results = {}
    ok = True
    for dtype, (atol, rtol) in PARITY_BANDS.items():
        t0 = time.perf_counter()
        worst, errs = level_parity_errors(dtype)
        worst_tensor = max(errs, key=errs.get)
        entry = {
            "worst_normalized_err": round(worst, 4),
            "margin": round(1.0 - worst, 4),
            "worst_tensor": worst_tensor,
            "atol": atol, "rtol": rtol,
            "seconds": round(time.perf_counter() - t0, 1),
        }
        if dtype == "float32":
            # Attribution leg 1: oracle at "highest" matmul precision,
            # kernel at default. Round-5 measurement: the error GROWS
            # (0.92 -> 6.3 of band) — i.e. the default-precision gate was
            # passing because kernel and oracle SHARE the f32-on-TPU
            # bf16x3 matmul error; the band is below the hardware's f32
            # matmul precision floor, not a kernel-algorithm margin.
            worst_hp, errs_hp = level_parity_errors(
                dtype, oracle_precision="highest"
            )
            entry["worst_vs_highest_precision_oracle"] = round(worst_hp, 4)
            entry["worst_tensor_vs_highest"] = max(errs_hp, key=errs_hp.get)
            # Attribution leg 2 (the ALGORITHM gate): BOTH sides at
            # "highest" (bf16x6 ~ true f32). This isolates kernel math
            # from the hardware floor; it must sit WELL inside the band.
            worst_alg, errs_alg = level_parity_errors(
                dtype, oracle_precision="highest",
                kernel_precision="highest",
            )
            entry["worst_both_highest_precision"] = round(worst_alg, 4)
            entry["margin_algorithm"] = round(1.0 - worst_alg, 4)
            entry["worst_tensor_both_highest"] = max(
                errs_alg, key=errs_alg.get)
            ok = ok and worst_alg < 0.5
        results[dtype] = entry
        ok = ok and worst < 1.0

    print(json.dumps({
        "ok": ok,
        "platform": jax.devices()[0].platform,
        "results": results,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
