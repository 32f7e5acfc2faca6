"""Offline XPlane analysis: where the step's device time actually goes.

Async ops (copy-start/done pairs) report start->done spans that overlap the
real compute, so naive per-op duration sums overcount wildly.  This script
instead builds a per-line busy timeline of SYNCHRONOUS ops only, prints each
op's self time, and separately reports how much of the async-copy span is
NOT hidden under compute (the true exposed copy cost).

Usage: python benchmarks/analyze_trace.py /tmp/xprof_r3 [--steps 20]
"""

import argparse
import collections
import glob
import os
import re
import sys


def load_events(trace_dir):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorboard_plugin_profile.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    assert paths, f"no xplane under {trace_dir}"
    events = []  # (name, t0, t1)
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            ev_names = dict(plane.event_metadata.items())
            for line in plane.lines:
                if "XLA Ops" not in line.name:
                    continue
                for ev in line.events:
                    name = ev_names[ev.metadata_id].name
                    t0 = line.timestamp_ns * 1e-9 + ev.offset_ps * 1e-12
                    t1 = t0 + ev.duration_ps * 1e-12
                    events.append((name, t0, t1))
    return events


def union_time(intervals):
    if not intervals:
        return 0.0
    intervals = sorted(intervals)
    total = 0.0
    cur0, cur1 = intervals[0]
    for a, b in intervals[1:]:
        if a > cur1:
            total += cur1 - cur0
            cur0, cur1 = a, b
        else:
            cur1 = max(cur1, b)
    total += cur1 - cur0
    return total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--raw", action="store_true",
                   help="per-op names (with shapes) instead of families")
    args = p.parse_args()

    events = load_events(args.trace_dir)
    is_async = lambda n: n.startswith("%copy-start") or n.startswith(
        "%copy-done") or "copy-start" in n.split(" = ")[0]

    sync = [(n, a, b) for n, a, b in events if not is_async(n)]
    async_ev = [(n, a, b) for n, a, b in events if is_async(n)]

    sync_busy = union_time([(a, b) for _, a, b in sync])
    span0 = min(a for _, a, _ in events)
    span1 = max(b for _, _, b in events)
    async_union = union_time([(a, b) for _, a, b in async_ev])

    # Exposed async time: async intervals minus sync intervals.
    # Approximate by merging sync intervals and subtracting overlaps.
    sync_iv = sorted((a, b) for _, a, b in sync)
    merged = []
    for a, b in sync_iv:
        if merged and a <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], b))
        else:
            merged.append((a, b))

    def exposed(a, b):
        t = b - a
        for sa, sb in merged:
            if sb <= a:
                continue
            if sa >= b:
                break
            t -= min(b, sb) - max(a, sa)
        return max(t, 0.0)

    async_exposed = sum(exposed(a, b) for a, b in
                        sorted((a, b) for _, a, b in async_ev))

    n = args.steps
    print(f"span            : {(span1-span0)/n*1e3:8.3f} ms/step")
    print(f"sync busy       : {sync_busy/n*1e3:8.3f} ms/step")
    print(f"gap (span-sync) : {(span1-span0-sync_busy)/n*1e3:8.3f} ms/step")
    print(f"async copy union: {async_union/n*1e3:8.3f} ms/step "
          f"(exposed beyond sync compute: {async_exposed/n*1e3:.3f})")

    # Per-op self time (sync only), collapsed by op family.
    def family(name):
        if args.raw:
            return name[:110]
        head = name.split(" = ")[0].lstrip("%")
        return re.sub(r"\.\d+$", "", head)

    tot = collections.Counter()
    cnt = collections.Counter()
    for nme, a, b in sync:
        tot[family(nme)] += b - a
        cnt[family(nme)] += 1
    print(f"\n{'op family':48s} {'ms/step':>8s} {'calls/step':>10s}")
    for k, v in tot.most_common(args.top):
        print(f"{k[:48]:48s} {v/n*1e3:8.3f} {cnt[k]/n:10.1f}")


if __name__ == "__main__":
    main()
