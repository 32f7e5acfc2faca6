"""Scaling-efficiency benchmark over the data-parallel mesh.

Weak scaling: fixed rays/device, mesh sizes 1..N; efficiency(N) =
throughput(N) / (N * throughput(1)) — BASELINE target >= 85% to 2 hosts.

On the single-chip CI machine this runs on the virtual CPU mesh
(--force-cpu, 8 devices) to validate the *mechanism* (sharding, psum,
per-shard PRNG); absolute numbers come from real pod slices.

Usage:
  python benchmarks/bench_scaling.py [--force-cpu] [--rays-per-device N]
      [--devices 1,2,4,8] [--samples N]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--force-cpu", action="store_true")
    p.add_argument("--rays-per-device", type=int, default=256)
    p.add_argument("--devices", type=str, default="")
    p.add_argument("--samples", type=int, default=32)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    if args.force_cpu:
        import os

        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/non_tpu_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _example_batch
    from nerf_or_nothing_tpu.config import Config
    from nerf_or_nothing_tpu.parallel import mesh as mesh_lib
    from nerf_or_nothing_tpu.rays import Rays
    from nerf_or_nothing_tpu.train import init_train_state
    from nerf_or_nothing_tpu.utils.profiling import timed

    n_avail = len(jax.devices())
    if args.devices:
        sizes = [int(x) for x in args.devices.split(",") if int(x) <= n_avail]
    else:
        sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]

    results = {}
    for n in sizes:
        cfg = Config(
            batch_size=args.rays_per_device * n,
            num_samples=args.samples,
            use_pallas=jax.default_backend() in ("tpu", "axon"),
            donate_params=False,
        )
        mesh = mesh_lib.create_mesh(n)
        state = mesh_lib.replicate_state(mesh, init_train_state(cfg))
        rays, pixels = _example_batch(cfg, cfg.batch_size)
        sh_rays, sh_pixels = mesh_lib.shard_batch(
            mesh, Rays(*[np.asarray(x) for x in rays]), np.asarray(pixels)
        )
        step = mesh_lib.make_sharded_train_step(cfg, mesh)
        dt = timed(lambda: step(state, sh_rays, sh_pixels),
                   iters=args.steps, warmup=2)
        results[n] = cfg.batch_size / dt

    base = results[sizes[0]] / sizes[0]
    report = {
        "metric": "scaling_efficiency",
        "rays_per_sec": {n: round(v, 1) for n, v in results.items()},
        "efficiency": {
            n: round(results[n] / (n * base), 4) for n in sizes
        },
        "unit": "fraction of linear",
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
