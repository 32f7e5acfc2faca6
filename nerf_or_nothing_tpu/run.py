"""Top-level train / eval / render entry points (the reference's
``Program.Main``/``Train`` loop, ``ScratchNerf/Program.cs:12-62``, made real:
logging actually populated, checkpoints actually saved, eval actually runs).

CLI:
  python -m nerf_or_nothing_tpu.run train --data-dir=... --max-steps=...
  python -m nerf_or_nothing_tpu.run eval  --data-dir=... --checkpoint-dir=...
  python -m nerf_or_nothing_tpu.run render --data-dir=... --out=...
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_or_nothing_tpu import checkpoint as ckpt_lib
from nerf_or_nothing_tpu.config import Config, parse_flags
from nerf_or_nothing_tpu.datasets.base import create_dataset
from nerf_or_nothing_tpu.eval import (
    evaluate_dataset,
    make_render_fn,
    render_image,
    to_display,
)
from nerf_or_nothing_tpu.metrics import MetricsLogger
from nerf_or_nothing_tpu.parallel import mesh as mesh_lib
from nerf_or_nothing_tpu.rays import Rays
from nerf_or_nothing_tpu.train import (
    TrainState,
    init_train_state,
    make_jitted_multi_step,
    make_jitted_train_step,
)


def _chunk_len(step: int, cfg: Config, spc: int) -> int:
    """Steps until the next loop boundary (log/save/test-render/gc/end),
    capped at ``spc`` — multi-step chunks never skip a side-effect step."""
    nxt = cfg.max_steps - step
    for interval in (cfg.print_every, cfg.save_every,
                     cfg.test_render_interval, cfg.gc_every):
        if interval > 0:
            nxt = min(nxt, (step // interval + 1) * interval - step)
    return max(1, min(spc, nxt))


def train(cfg: Config, log_dir: Optional[str] = None) -> TrainState:
    """The training loop (Program.cs:21-62 equivalent).

    Single-host: uses all local devices through the data-parallel mesh when
    more than one is present, else the plain jit path.
    """
    if cfg.debug_nans:
        # Sanitizer mode (SURVEY.md §5.2): raise on the first NaN instead of
        # training through it like the reference does (it prints kernel
        # errors and keeps going, AcceleratedMipNeRF.cpp:97-101).
        jax.config.update("jax_debug_nans", True)
    dataset = create_dataset("train", cfg.data_dir, cfg)
    state = init_train_state(cfg)
    start_step = 0
    if cfg.checkpoint_dir and cfg.resume:
        state = ckpt_lib.maybe_restore(cfg.checkpoint_dir, state)
        start_step = int(state.step)
        if start_step:
            print(f"resumed from step {start_step}")

    # Mesh selection (Config.mesh_shape): () = all local devices on a 1-D
    # 'batch' mesh, (n,) = n-device DP, (dp, mp) = 2-D tensor parallelism.
    n_dev = len(jax.devices())
    mesh_shape = tuple(cfg.mesh_shape)
    single_device = False
    if len(mesh_shape) > 2:
        raise ValueError(f"mesh_shape must be 1-D or 2-D, got {mesh_shape}")
    if len(mesh_shape) == 2:
        mesh = mesh_lib.create_mesh_2d(*mesh_shape)
        step_fn, state_sh, batch_sh = (
            mesh_lib.make_tensor_parallel_train_step(cfg, mesh)
        )
        state = jax.tree.map(jax.device_put, state, state_sh)

        def put(rays, pixels):
            return (
                Rays(*[jax.device_put(np.asarray(x), batch_sh)
                       for x in rays]),
                jax.device_put(np.asarray(pixels), batch_sh),
            )
    elif (mesh_shape[0] if mesh_shape else n_dev) > 1:
        mesh = mesh_lib.create_mesh(mesh_shape[0] if mesh_shape else None)
        state = mesh_lib.replicate_state(mesh, state)
        step_fn = mesh_lib.make_sharded_train_step(cfg, mesh)

        def put(rays, pixels):
            return mesh_lib.shard_batch(mesh, rays, pixels)

        def put_stack(rays_stack, pixels_stack):
            return mesh_lib.shard_batch_stack(mesh, rays_stack, pixels_stack)

        def make_multi():
            return mesh_lib.make_sharded_multi_step(cfg, mesh)
    else:
        single_device = True
        step_fn = make_jitted_train_step(cfg)

        def put(rays, pixels):
            return (
                Rays(*[jnp.asarray(x) for x in rays]), jnp.asarray(pixels)
            )

        def put_stack(rays_stack, pixels_stack):
            return (
                Rays(*[jnp.asarray(x) for x in rays_stack]),
                jnp.asarray(pixels_stack),
            )

        def make_multi():
            return make_jitted_multi_step(cfg)

    # Multi-host: metrics/checkpoints are written by process 0 only (stats
    # and params are replicated — every process holds identical copies).
    is_lead = jax.process_index() == 0
    logger = MetricsLogger(
        log_dir if is_lead else None, batch_size=cfg.batch_size
    )
    stats = None
    # Periodic held-out render (the reference's declared-but-dead
    # Config.TestRenderInterval, TrainState.cs:63, as a working feature):
    # every test_render_interval steps, render one test view and log
    # PSNR/SSIM. 0 disables.
    test_ds = None
    render_fn = None
    render_mesh = None
    import gc

    # In-graph multi-step (steps_per_call > 1): single-device AND 1-D
    # data-parallel mesh (lax.scan inside shard_map — the pod path gets the
    # same 1/K dispatch amortization). Profiling stays per-step; the 2-D
    # tensor-parallel option keeps per-step dispatch (it exists for models
    # wide enough that step time dwarfs dispatch).
    spc = cfg.steps_per_call if (
        cfg.steps_per_call > 1 and not cfg.profile_dir
        and len(mesh_shape) != 2
    ) else 1
    multi_fn = make_multi() if spc > 1 else None

    tracing = False
    step = start_step
    try:
        while step < cfg.max_steps:
            k = _chunk_len(step, cfg, spc)
            if k > 1:
                batches = [next(dataset) for _ in range(k)]
                rays_stack, pixels_stack = put_stack(
                    Rays(*[
                        np.stack([np.asarray(b[0][i]) for b in batches])
                        for i in range(len(batches[0][0]))
                    ]),
                    np.stack([np.asarray(b[1]) for b in batches]),
                )
                state, stacked = multi_fn(state, rays_stack, pixels_stack)
                stats = jax.tree.map(lambda a: a[-1], stacked)
                step += k
            else:
                step += 1
                if cfg.profile_dir and step == start_step + 11:
                    jax.profiler.start_trace(cfg.profile_dir)
                    tracing = True
                rays, pixels = next(dataset)
                state, stats = step_fn(state, *put(rays, pixels))
                if tracing and step >= start_step + 20:
                    jax.tree.map(lambda x: x.block_until_ready(), stats)
                    jax.profiler.stop_trace()
                    tracing = False
                    print(f"trace written to {cfg.profile_dir}", flush=True)
            if step % cfg.print_every == 0 and is_lead:
                logger.log(step, jax.device_get(stats))
            if cfg.checkpoint_dir and step % cfg.save_every == 0 and is_lead:
                ckpt_lib.save_checkpoint(cfg.checkpoint_dir, state)
            if (
                cfg.test_render_interval > 0
                and step % cfg.test_render_interval == 0
                and is_lead
            ):
                try:
                    if test_ds is None:
                        test_ds = create_dataset("test", cfg.data_dir, cfg)
                        # Render THROUGH the training mesh when one exists
                        # on this single process (1-D DP): params stay on
                        # device (they are already mesh-replicated) and the
                        # full mesh renders the view. Multi-host and 2-D TP
                        # fall back to a host pull + lead-local render (a
                        # lead-only mesh render would deadlock the other
                        # processes; TP shards the weight matrices).
                        render_mesh = (
                            mesh
                            if (not single_device and len(mesh_shape) != 2
                                and jax.process_count() == 1)
                            else None
                        )
                        render_fn = make_render_fn(cfg, mesh=render_mesh)
                    trays, tgt = test_ds.image_rays(0)
                    th, tw = test_ds.image_dims(0)
                    render_params = (
                        state.params
                        if render_mesh is not None or single_device
                        else jax.tree.map(np.asarray, state.params)
                    )
                    rgb, _, _ = render_image(
                        render_fn, render_params,
                        Rays(*[jnp.asarray(x) for x in trays]),
                        th, tw, cfg.render_chunk_size, mesh=render_mesh,
                    )
                    from nerf_or_nothing_tpu.eval import evaluate_image

                    m = evaluate_image(
                        to_display(cfg, rgb),
                        to_display(cfg, np.asarray(tgt).reshape(th, tw, 3)),
                    )
                    print(f"step {step:>7d}  test view 0: "
                          f"psnr {m['psnr']:.2f} ssim {m['ssim']:.3f}",
                          flush=True)
                except Exception as e:  # no/unusable test split: warn once, off
                    print(f"test render disabled: {type(e).__name__}: {e}",
                          flush=True)
                    cfg = cfg.replace(test_render_interval=0)
            if cfg.gc_every > 0 and step % cfg.gc_every == 0:
                # Config.GcEvery (TrainState.cs:62): periodic host GC keeps the
                # long-running loop's Python garbage (per-batch numpy views,
                # logging dicts) from accumulating into pauses.
                gc.collect()
        if tracing:
            jax.profiler.stop_trace()  # loop too short to hit the stop step
        if cfg.checkpoint_dir and is_lead:
            ckpt_lib.save_checkpoint(cfg.checkpoint_dir, state)
        logger.close()
    finally:
        # Stop the prefetch workers (daemon threads) deterministically
        # even on an exception mid-training.
        dataset.close()
        if test_ds is not None:
            test_ds.close()
    return state


def _eval_mesh():
    """Data-parallel mesh for eval/render when more than one chip is local
    (full-image renders then use the whole mesh, not one device)."""
    if len(jax.devices()) > 1:
        return mesh_lib.create_mesh()
    return None


def evaluate(cfg: Config, max_images: Optional[int] = None) -> dict:
    state = init_train_state(cfg)
    if cfg.checkpoint_dir:
        state = ckpt_lib.maybe_restore(cfg.checkpoint_dir, state)
    with create_dataset("test", cfg.data_dir, cfg) as dataset:
        metrics = evaluate_dataset(
            cfg, state.params, dataset, max_images, mesh=_eval_mesh()
        )
    print({k: round(v, 4) for k, v in metrics.items()})
    return metrics


def render(cfg: Config, out_dir: str, max_images: Optional[int] = None):
    """Render the test split, or — with ``cfg.render_path`` (the reference's
    declared ``Config.RenderPath``, TrainState.cs:53) — the novel-view
    camera path (LLFF spiral / spherified orbit)."""
    from PIL import Image

    state = init_train_state(cfg)
    if cfg.checkpoint_dir:
        state = ckpt_lib.maybe_restore(cfg.checkpoint_dir, state)
    dataset = create_dataset("test", cfg.data_dir, cfg)
    try:
        mesh = _eval_mesh()
        render_fn = make_render_fn(cfg, mesh=mesh)
        os.makedirs(out_dir, exist_ok=True)
        if cfg.render_path and hasattr(dataset, "render_path_rays"):
            # [(flat rays, (h, w)), ...] — the image_rays contract.
            ray_list = dataset.render_path_rays()
            if max_images is not None:
                ray_list = ray_list[:max_images]
            frames = ((i, r, dims) for i, (r, dims) in enumerate(ray_list))
        else:
            n = dataset.num_images if max_images is None else min(
                max_images, dataset.num_images
            )
            frames = (
                (i, dataset.image_rays(i)[0], dataset.image_dims(i))
                for i in range(n)
            )
        for i, rays, (h, w) in frames:
            rgb, dist, acc = render_image(
                render_fn, state.params,
                Rays(*[jnp.asarray(x) for x in rays]),
                h, w, cfg.render_chunk_size, mesh=mesh,
            )
            rgb = to_display(cfg, rgb)
            img = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(out_dir, f"render_{i:03d}.png"))
            print(f"wrote render_{i:03d}.png")
    finally:
        dataset.close()


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in ("train", "eval", "render"):
        print(__doc__)
        return 2
    command, rest = argv[0], argv[1:]
    out = None
    max_images = None
    # Multi-host launch flags (pod slices): --coordinator=host:port
    # --num-processes=N --process-id=I, with NERF_COORDINATOR /
    # NERF_NUM_PROCESSES / NERF_PROCESS_ID env fallbacks (launcher-friendly).
    coordinator = os.environ.get("NERF_COORDINATOR")
    num_processes = os.environ.get("NERF_NUM_PROCESSES")
    process_id = os.environ.get("NERF_PROCESS_ID")
    platform = os.environ.get("NERF_PLATFORM")
    filtered = []
    for a in rest:
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
        elif a.startswith("--max-images="):
            max_images = int(a.split("=", 1)[1])
        elif a.startswith("--coordinator="):
            coordinator = a.split("=", 1)[1]
        elif a.startswith("--num-processes="):
            num_processes = a.split("=", 1)[1]
        elif a.startswith("--process-id="):
            process_id = a.split("=", 1)[1]
        elif a.startswith("--platform="):
            platform = a.split("=", 1)[1]
        else:
            filtered.append(a)
    if platform:
        # e.g. --platform=cpu: overrides any site-level platform pinning
        # (the JAX_PLATFORMS env var loses to an explicit config update).
        jax.config.update("jax_platforms", platform)
    # Must run before any device query (jax backend init is lazy, so doing
    # it here — after imports, before Config/dataset/mesh — is safe).
    mesh_lib.initialize_multihost(
        coordinator_address=coordinator,
        num_processes=int(num_processes) if num_processes else None,
        process_id=int(process_id) if process_id else None,
    )
    cfg = parse_flags(filtered)
    if command == "train":
        train(cfg, log_dir=cfg.checkpoint_dir or None)
    elif command == "eval":
        evaluate(cfg, max_images)
    else:
        render(cfg, out or "renders", max_images)
    return 0


if __name__ == "__main__":
    sys.exit(main())
