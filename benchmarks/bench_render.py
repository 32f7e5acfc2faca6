"""Render (inference) throughput: chunked full-image forward, fine level.

The render path is the fused fwd kernel only (no backward) — the number a
serving deployment cares about. Prints ONE JSON line:
  {"metric": "render_rays_per_sec", "value": ..., "unit": "rays/s/chip",
   "chunk": N}
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=8192)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from nerf_or_nothing_tpu.config import Config
    from nerf_or_nothing_tpu.eval import make_render_fn
    from nerf_or_nothing_tpu.models import mlp as mlp_lib

    cfg = Config(batch_size=args.chunk)
    params = mlp_lib.init_mlp(jax.random.PRNGKey(0), cfg)
    rays, _ = _example_batch(cfg, args.chunk)
    render_fn = make_render_fn(cfg)
    key = jax.random.PRNGKey(1)

    rgb, _, _ = render_fn(params, key, rays)
    float(rgb.sum())  # sync by materialization (not block_until_ready)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        rgb, _, _ = render_fn(params, key, rays)
    float(rgb.sum())
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": "render_rays_per_sec",
        "value": round(args.chunk / dt, 1),
        "unit": "rays/s/chip",
        "chunk": args.chunk,
    }))


if __name__ == "__main__":
    main()
