"""Per-op time budget of the render (inference) path, from an XProf trace.

The render-path counterpart of profile_step.py: captures N chunked
render_fn calls on the real chip and prints the per-op device budget —
the fused render kernels, the IPE encode fusions, sampling/resample, and
everything else. Evidence base for the render-roofline gap analysis in
docs/PERF.md (VERDICT r4 #2).

Usage: python benchmarks/profile_render.py [--chunk 8192] [--iters 20]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_step import parse_xplane  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=8192)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--keep-trace", type=str, default="")
    p.add_argument("--fuse-ipe", action=argparse.BooleanOptionalAction,
                   default=None)
    p.add_argument("--fast-ipe", action=argparse.BooleanOptionalAction,
                   default=None)
    p.add_argument("--pair-ipe", action=argparse.BooleanOptionalAction,
                   default=None)
    p.add_argument("--xt-ipe", action=argparse.BooleanOptionalAction,
                   default=None)
    p.add_argument("--probes", type=str, default="")
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
    float(rgb.sum())

    trace_dir = args.keep_trace or tempfile.mkdtemp(prefix="xprof_render_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.iters):
            rgb, _, _ = render_fn(params, key, rays)
        float(rgb.sum())

    totals, counts, span = parse_xplane(trace_dir)
    busy = sum(totals.values())
    print(f"\nDevice busy over {args.iters} renders: {busy*1e3:.2f} ms "
          f"({busy/args.iters*1e3:.3f} ms/render of {args.chunk} rays)")
    if span[0] is not None:
        wall = span[1] - span[0]
        print(f"Device span: {wall/args.iters*1e3:.3f} ms/render "
              f"(gap {(wall-busy)/args.iters*1e3:.3f})")
    print(f"\n{'op':60s} {'total ms':>9s} {'ms/rend':>8s} {'calls':>6s}")
    for name, t in totals.most_common(30):
        print(f"{name[:60]:60s} {t*1e3:9.2f} {t/args.iters*1e3:8.3f} "
              f"{counts[name]:6d}")


if __name__ == "__main__":
    main()
