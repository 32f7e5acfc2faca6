"""Training-throughput benchmark: rays/s/chip + fraction of roofline.

Usage:
  python benchmarks/bench_train.py [--batch-size N] [--steps N]
      [--no-pallas] [--levels N] [--samples N] [--json]

Reports the full train step (fwd + bwd + Adam) on the flagship MipNeRF
config (8x256 MLP, hierarchical 128+128, the reference GPU path's workload,
helpers.h:16-18), against the explicit roofline model in
utils/profiling.mlp_roofline.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--levels", type=int, default=2)
    p.add_argument("--samples", type=int, default=128)
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/non_tpu_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from __graft_entry__ import _example_batch
    from nerf_or_nothing_tpu.config import Config
    from nerf_or_nothing_tpu.train import init_train_state, make_jitted_train_step
    from nerf_or_nothing_tpu.utils.profiling import chip_peaks, mlp_roofline, timed

    cfg = Config(
        batch_size=args.batch_size,
        use_pallas=not args.no_pallas,
        num_levels=args.levels,
        num_samples=args.samples,
    )
    state = init_train_state(cfg)
    rays, pixels = _example_batch(cfg, cfg.batch_size)
    step = make_jitted_train_step(cfg.replace(donate_params=False))

    dt = timed(lambda: step(state, rays, pixels),
               iters=args.steps, warmup=args.warmup)
    rays_per_sec = cfg.batch_size / dt

    rows = cfg.batch_size * cfg.num_samples * cfg.num_levels
    roof = mlp_roofline(cfg, rows, backward=True)
    t_roof = roof["t_roofline_s"]
    frac = t_roof / dt

    report = {
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s/chip",
        "step_ms": round(dt * 1e3, 2),
        "roofline_ms": round(t_roof * 1e3, 2),
        "fraction_of_roofline": round(frac, 4),
        "batch_size": cfg.batch_size,
        "use_pallas": cfg.use_pallas,
        "device": getattr(jax.devices()[0], "device_kind", "unknown"),
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
