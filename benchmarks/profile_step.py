"""Per-op time budget of the real train step, from an XProf trace.

Captures a ``jax.profiler`` trace of N flagship train steps on the real
chip, parses the XPlane protobuf directly (tensorboard-plugin-profile's
schema), and prints where the step time actually goes: each Pallas kernel,
every XLA fusion, infeed/outfeed, and the gap overhead. This is the
measured evidence behind docs/PERF.md's budget table.

Usage: python benchmarks/profile_step.py [--steps 20] [--batch-size 1024]
"""

import argparse
import collections
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(trace_dir: str):
    """Aggregate event durations per op name from the device plane."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # plugin fallback (layout varies by version)
        from tensorboard_plugin_profile.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    assert paths, f"no xplane under {trace_dir}"
    totals = collections.Counter()
    counts = collections.Counter()
    device_span = [None, None]
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            ev_names = {k: v for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                # XLA Ops lines carry per-HLO timing; steps/xla-modules
                # duplicate them at coarser granularity.
                if line.name not in ("XLA Ops",) and "XLA Ops" not in line.name:
                    continue
                for ev in line.events:
                    name = ev_names[ev.metadata_id].name
                    dur = ev.duration_ps / 1e12
                    totals[name] += dur
                    counts[name] += 1
                    t0 = line.timestamp_ns / 1e9 + ev.offset_ps / 1e12
                    t1 = t0 + dur
                    if device_span[0] is None or t0 < device_span[0]:
                        device_span[0] = t0
                    if device_span[1] is None or t1 > device_span[1]:
                        device_span[1] = t1
    return totals, counts, device_span


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--keep-trace", type=str, default="")
    # Tri-state: unset -> Config defaults (fast_ipe defaults True there).
    p.add_argument("--fuse-ipe", action=argparse.BooleanOptionalAction,
                   default=None)
    p.add_argument("--fast-ipe", action=argparse.BooleanOptionalAction,
                   default=None)
    p.add_argument("--pair-ipe", action=argparse.BooleanOptionalAction,
                   default=None)
    p.add_argument("--xt-ipe", action=argparse.BooleanOptionalAction,
                   default=None)
    p.add_argument(
        "--probes", type=str, default="",
        help="kernel perf-attribution probes, e.g. "
             "'fm_bwd=phased,fl_tile=4096' (Config.kernel_probes)",
    )
    args = p.parse_args()

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from __graft_entry__ import _example_batch
    from nerf_or_nothing_tpu.config import Config
    from nerf_or_nothing_tpu.train import (
        init_train_state, make_jitted_train_step,
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
    step = make_jitted_train_step(cfg)
    for _ in range(5):  # compile + warm
        state, stats = step(state, rays, pixels)
    float(stats.loss)

    trace_dir = args.keep_trace or tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            state, stats = step(state, rays, pixels)
        float(stats.loss)  # sync inside the trace window

    totals, counts, span = parse_xplane(trace_dir)
    busy = sum(totals.values())
    print(f"\nDevice busy time over {args.steps} steps: "
          f"{busy*1e3:.2f} ms  ({busy/args.steps*1e3:.3f} ms/step)")
    if span[0] is not None:
        wall = span[1] - span[0]
        print(f"Device span: {wall*1e3:.2f} ms "
              f"({wall/args.steps*1e3:.3f} ms/step; gap = span - busy = "
              f"{(wall-busy)/args.steps*1e3:.3f} ms/step)")
    print(f"\n{'op':60s} {'total ms':>9s} {'ms/step':>8s} {'calls':>6s}")
    for name, t in totals.most_common(25):
        print(f"{name[:60]:60s} {t*1e3:9.2f} {t/args.steps*1e3:8.3f} "
              f"{counts[name]:6d}")
    print(json.dumps({
        "metric": "step_busy_ms",
        "value": round(busy / args.steps * 1e3, 3),
        "unit": "ms/step",
        "steps": args.steps,
    }))


if __name__ == "__main__":
    main()
