"""Render (inference) throughput: chunked full-image forward, fine level.

The render path is the fused fwd kernel only (no backward) — the number a
serving deployment cares about. Prints ONE JSON line:
  {"metric": "render_rays_per_sec", "value": ..., "unit": "rays/s/chip",
   "chunk": N, "vs_render_roofline": ...}

Roofline denominator (the render path's own speed of light): inference
has no dW/db and no g-chain, so
  FLOPs/ray = 2 * (num_levels * num_samples) * n_params
(one matmul pass over every (ray, sample) row, both levels) and
  roofline_rays_per_sec = peak_bf16_flops / FLOPs_per_ray
— exactly 3x the train roofline (train pays fwd + ~2x bwd, SURVEY.md §6).
At the flagship config on v5e (197 TFLOP/s) that is ~703k rays/s.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import guess_peak  # noqa: E402  (repo-root import)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=8192)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--windows", type=int, default=3,
                   help="independently timed windows (best + median "
                        "reported)")
    # Tri-state: unset -> Config defaults (fast_ipe defaults True there).
    p.add_argument("--fuse-ipe", action=argparse.BooleanOptionalAction,
                   default=None)
    p.add_argument("--fast-ipe", action=argparse.BooleanOptionalAction,
                   default=None)
    p.add_argument("--pair-ipe", action=argparse.BooleanOptionalAction,
                   default=None)
    p.add_argument("--xt-ipe", action=argparse.BooleanOptionalAction,
                   default=None)
    p.add_argument("--probes", type=str, default="",
                   help="kernel probes, e.g. 'fr_tile=8192,fr_il=8'")
    args = p.parse_args()

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from __graft_entry__ import _example_batch
    from nerf_or_nothing_tpu.config import Config
    from nerf_or_nothing_tpu.eval import make_render_fn
    from nerf_or_nothing_tpu.models import mlp as mlp_lib

    overrides = {
        k: v for k, v in
        (("fuse_ipe", args.fuse_ipe), ("fast_ipe", args.fast_ipe),
         ("pair_ipe", args.pair_ipe), ("xt_ipe", args.xt_ipe))
        if v is not None
    }
    cfg = Config(batch_size=args.chunk, kernel_probes=args.probes,
                 **overrides)
    params = mlp_lib.init_mlp(jax.random.PRNGKey(0), cfg)
    rays, _ = _example_batch(cfg, args.chunk)
    render_fn = make_render_fn(cfg)
    key = jax.random.PRNGKey(1)

    rgb, _, _ = render_fn(params, key, rays)
    float(rgb.sum())  # sync by materialization (not block_until_ready)
    window_vals = []
    for _ in range(args.windows):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            rgb, _, _ = render_fn(params, key, rays)
        float(rgb.sum())
        dt = (time.perf_counter() - t0) / args.iters
        window_vals.append(args.chunk / dt)
    best = max(window_vals)
    median = float(np.median(window_vals))

    n_params = mlp_lib.num_params(cfg)
    flops_per_ray = 2 * (cfg.num_levels * cfg.num_samples) * n_params
    peak = guess_peak(jax.devices()[0])
    roofline = peak / flops_per_ray
    print(json.dumps({
        "metric": "render_rays_per_sec",
        "value": round(best, 1),
        "unit": "rays/s/chip",
        "chunk": args.chunk,
        "vs_render_roofline": round(best / roofline, 4),
        "median": round(median, 1),
        "median_vs_render_roofline": round(median / roofline, 4),
        "render_roofline_rays_per_sec": round(roofline, 1),
    }))


if __name__ == "__main__":
    main()
