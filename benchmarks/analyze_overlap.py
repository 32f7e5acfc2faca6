"""Measure the gradient-allreduce schedule (no pod required).

Compiles the REAL sharded train step ahead-of-time against a multi-chip TPU
topology (``jax.experimental.topologies`` — the XLA TPU compiler plans
collectives and the full schedule without owning the chips) and reports
what the optimized, scheduled HLO actually does with the gradient psums:

- how many collectives survive (XLA's all-reduce combiner merges small
  ones: our per-level ~2 MB psums are expected to combine),
- sync vs async (``all-reduce`` vs ``all-reduce-start``/``-done`` pair; an
  async pair with compute between start and done is overlapped),
- payload bytes, ring strategy, and an ICI-time estimate vs the step time.

This replaces the previously-asserted-but-unmeasured claim that "the 2 MB
psum overlaps with the remaining backward" (README r1): see
``docs/overlap_hlo_excerpt.txt`` and PERF.md for what the compiler
actually schedules and why that is the right call at this model size.

Usage: python benchmarks/analyze_overlap.py [topology] [--slices=N]
        [--out=PATH]
(default v5e:2x2, 1 slice). ``--slices`` > 1 AOT-compiles a MULTI-SLICE
topology — data parallelism spanning DCN-connected pod slices — and
reports how the gradient all-reduce is laid out across the slice
boundary (SURVEY.md §5.8: "ICI within a slice, DCN across slices").
"""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e: 1 ICI port pair per axis on a 2D torus; ~45 GB/s effective per link
# direction (scaling-book numbers) — used only for a coarse time estimate.
ICI_BYTES_PER_SEC = 45e9


def main(topology: str = "v5e:2x2", slices: str = "1",
         out_path: str | None = None) -> None:
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from nerf_or_nothing_tpu.config import Config
    from nerf_or_nothing_tpu.parallel import mesh as mesh_lib
    from nerf_or_nothing_tpu.rays import Rays
    from nerf_or_nothing_tpu.train import init_train_state, make_train_step

    n_slices = int(slices)
    kwargs = {"num_slices": n_slices} if n_slices > 1 else {}
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topology, **kwargs)
    n_dev = len(topo.devices)
    if n_slices > 1:
        topology = f"{topology}x{n_slices}slices"
    mesh = Mesh(np.asarray(topo.devices), (mesh_lib.BATCH_AXIS,))
    cfg = Config(batch_size=1024 * n_dev, donate_params=False)

    step_fn = jax.shard_map(
        make_train_step(cfg, axis_name=mesh_lib.BATCH_AXIS),
        mesh=mesh,
        in_specs=(P(), P(mesh_lib.BATCH_AXIS), P(mesh_lib.BATCH_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P(mesh_lib.BATCH_AXIS))

    def shaped(x, sharding):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    state = jax.tree.map(lambda x: shaped(x, rep),
                         jax.eval_shape(lambda: init_train_state(cfg)))
    R = cfg.batch_size
    f32 = np.float32
    rays = Rays(*[shaped(np.zeros((R, c), f32), sh)
                  for c in (3, 3, 3, 1, 1, 1, 1)])
    pixels = shaped(np.zeros((R, 3), f32), sh)

    compiled = jax.jit(step_fn).lower(state, rays, pixels).compile()
    hlo = compiled.as_text()
    lines = hlo.splitlines()

    # Kernel landmarks: custom-calls are the Pallas fused-level kernels.
    kernel_lines = [
        i for i, ln in enumerate(lines) if "custom-call" in ln and "=" in ln
    ]

    results = []
    excerpt = []
    dcn_legs = []
    for i, line in enumerate(lines):
        # Cross-slice (DCN) reduction legs: XLA lowers the inter-slice part
        # of a multi-slice all-reduce to megascale-runtime send/recv pairs
        # (frontend attr _xla_megascale_reduce_operation) after the
        # intra-slice ICI all-reduce.
        if "_xla_megascale_reduce_operation" in line:
            sm = re.search(r"%(\S+) = .*?(send|recv)\(", line)
            # payload is the first f32 shape of the (data, u32, token) tuple
            shapes = re.findall(r"f32\[([\d,]*)\]", line)[:1]
            if sm:
                dcn_legs.append({
                    "op": sm.group(2),
                    "bytes": sum(
                        4 * int(np.prod(
                            [int(d) for d in s.split(",") if d] or [1]
                        ))
                        for s in shapes
                    ),
                })
                excerpt.append(
                    f"line {i}/{len(lines)}: " + line.strip()[:400]
                )
        m = re.search(r"%(\S+) = .*? (all-reduce(?:-start)?)\(", line)
        if not m:
            continue
        name, kind = m.group(1), m.group(2)
        shapes = re.findall(r"f32\[([\d,]*)\]", line.split(" all-reduce")[0])
        nbytes = sum(
            4 * int(np.prod([int(d) for d in s.split(",") if d] or [1]))
            for s in shapes
        )
        strategy = ""
        sm = re.search(r'"strategy":"([^"]+)"', line)
        if sm:
            strategy = sm.group(1)
        kernels_after = sum(1 for k in kernel_lines if k > i)
        results.append({
            "collective": name,
            "kind": "async" if kind.endswith("start") else "sync",
            "bytes": nbytes,
            "strategy": strategy,
            "pallas_kernels_scheduled_after": kernels_after,
            "est_ici_us": round(
                2 * (n_dev - 1) / n_dev * nbytes / ICI_BYTES_PER_SEC * 1e6, 1
            ),
        })
        excerpt.append(f"line {i}/{len(lines)}: " + line.strip()[:400])

    for r in results:
        print(json.dumps({"metric": "allreduce_schedule", **r,
                          "topology": topology}))
    print(json.dumps({
        "metric": "allreduce_schedule_summary",
        "topology": topology,
        "collectives": len(results),
        "bytes_total": sum(r["bytes"] for r in results),
        "est_ici_us_total": round(sum(r["est_ici_us"] for r in results), 1),
        "pallas_kernels_in_program": len(kernel_lines),
        "dcn_reduce_legs": len(dcn_legs),
        "dcn_bytes_per_slice": sum(
            l["bytes"] for l in dcn_legs if l["op"] == "send"
        ),
    }))

    if out_path is None:
        fname = (
            "overlap_hlo_excerpt.txt"
            if (n_slices == 1 and topology == "v5e:2x2")
            else f"overlap_hlo_excerpt_{topology.replace(':', '_')}.txt"
        )
        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", fname,
        )
    with open(out_path, "w") as f:
        f.write(
            f"Scheduled-HLO collective report, topology {topology}, "
            f"flagship config (fused-level path), "
            f"{len(kernel_lines)} Pallas kernel launches in program.\n\n"
        )
        f.write("\n\n".join(excerpt) + "\n")
    print(f"excerpt -> {out_path}")


if __name__ == "__main__":
    # Flag-style slices/out (a positional argv[2] historically meant
    # out_path, then briefly slices — flags remove the ambiguity).
    _kw = {}
    _pos = []
    for a in sys.argv[1:]:
        if a.startswith("--slices="):
            _kw["slices"] = a.split("=", 1)[1]
        elif a.startswith("--out="):
            _kw["out_path"] = a.split("=", 1)[1]
        else:
            _pos.append(a)
    if len(_pos) > 1:
        sys.exit("usage: analyze_overlap.py [topology] [--slices=N] "
                 "[--out=PATH]")
    main(*(_pos or []), **_kw)
