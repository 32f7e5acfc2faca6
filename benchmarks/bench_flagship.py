"""Flagship quality run (VERDICT r3 #2): long-horizon training on the
256^2 hard analytic scene with REAL held-out evidence.

- trains the full model (8x256 MLP, hierarchical 128+128) for >=100k steps
  with the reference LR schedule (log-lerp 5e-4 -> 5e-6, 2500-step warmup,
  TrainState.cs:54-57) through the in-graph multi-step scan;
- every ``--eval-every`` steps renders ALL held-out test views and records
  PSNR/SSIM vs the point-sampled GT and PSNR vs the 4x-supersampled
  (footprint-averaged) GT — a multi-view held-out curve, not one number;
- measures the aliasing ceiling AT THE EVALUATION RESOLUTION:
  PSNR(point-sampled GT, supersampled GT) per view at ``--size`` (the r3
  ceiling was measured at 64^2 and did not transfer).

Writes ``benchmarks/artifacts/quality_curve_flagship.json`` and prints ONE
JSON line. Reference workload intent: 1M-step Blender training,
TrainState.cs:60; eval math MipHelpers.cs:669-736 (declared, never wired).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARTIFACTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "artifacts")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--scene", default="hard")
    p.add_argument("--eval-every", type=int, default=10_000)
    p.add_argument("--ss", type=int, default=4, help="supersampling factor")
    p.add_argument("--steps-per-call", type=int, default=250,
                   help="multi-step scan length per dispatch")
    p.add_argument("--num-samples", type=int, default=128,
                   help="samples per level (the 512^2 diagnosis sweep)")
    p.add_argument("--render-chunk", type=int, default=8192)
    args = p.parse_args()

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp
    import numpy as np

    from nerf_or_nothing_tpu.config import Config, DatasetType
    from nerf_or_nothing_tpu.eval import (
        evaluate_image, make_render_fn, render_image,
    )
    from nerf_or_nothing_tpu.datasets.base import create_dataset
    from nerf_or_nothing_tpu.ops.math_utils import mse_to_psnr
    from nerf_or_nothing_tpu.rays import (
        Rays, generate_rays, pinhole_pix_to_cam,
    )
    from nerf_or_nothing_tpu.train import (
        init_train_state, make_jitted_multi_step, make_jitted_train_step,
    )
    from nerf_or_nothing_tpu.utils import synthetic

    size, ss = args.size, args.ss
    angle = 0.8
    root = tempfile.mkdtemp()
    t_scene = time.perf_counter()
    synthetic.write_scene(root, n_train=24, n_test=3, size=size,
                          scene=args.scene)

    # The written test poses (write_scene's offset ring).
    n_test = 3
    test_poses = []
    for i in range(n_test):
        theta = 2.0 * np.pi * (i + 0.33) / n_test
        eye = 4.0 * np.array([
            np.cos(theta) * np.cos(0.45), np.sin(theta) * np.cos(0.45),
            np.sin(0.45),
        ])
        test_poses.append(synthetic._look_at(eye))

    def pose_rays(c2w, s):
        focal = 0.5 * s / np.tan(0.5 * angle)
        return generate_rays(pinhole_pix_to_cam(focal, s, s), c2w[:3],
                             s, s, 2.0, 6.0)

    def gt_point(c2w):
        r = pose_rays(c2w, size)
        return synthetic.render_rays_analytic(
            np.asarray(r.origins).reshape(-1, 3),
            np.asarray(r.directions).reshape(-1, 3), scene=args.scene,
        ).reshape(size, size, 3)

    def gt_supersampled(c2w):
        r = pose_rays(c2w, size * ss)
        return synthetic.render_rays_analytic(
            np.asarray(r.origins).reshape(-1, 3),
            np.asarray(r.directions).reshape(-1, 3), scene=args.scene,
        ).reshape(size, ss, size, ss, 3).mean(axis=(1, 3))

    def psnr(a, b):
        return float(mse_to_psnr(jnp.mean((jnp.asarray(a) - b) ** 2)))

    gts_point = [gt_point(c) for c in test_poses]
    gts_super = [gt_supersampled(c) for c in test_poses]
    # Aliasing ceiling at the EVALUATION resolution (no model involved).
    ceiling = [psnr(gp, gs) for gp, gs in zip(gts_point, gts_super)]
    print(f"scene + GT in {time.perf_counter() - t_scene:.0f}s; "
          f"{size}^2 aliasing ceiling/view: "
          f"{[round(c, 2) for c in ceiling]}", flush=True)

    cfg = Config(
        batch_size=args.batch_size,
        dataset_loader=DatasetType.BLENDER,
        # the reference schedule (TrainState.cs:54-57) over this horizon
        lr_init=5e-4, lr_final=5e-6, lr_delay_steps=2500,
        lr_delay_mult=0.01,
        max_steps=args.steps,
        num_samples=args.num_samples, num_levels=2, net_depth=8,
        net_width=256, net_width_condition=128,
    )
    ds = create_dataset("train", root, cfg)
    state = init_train_state(cfg)
    multi = make_jitted_multi_step(cfg)
    single = make_jitted_train_step(cfg)
    render_fn = make_render_fn(cfg)

    def eval_heldout(params, at_step):
        views = []
        for i, c2w in enumerate(test_poses):
            r = pose_rays(c2w, size)
            r = Rays(*[jnp.asarray(np.asarray(x).reshape(-1, x.shape[-1]))
                       for x in r])
            rgb, _, _ = render_image(render_fn, params, r, size, size,
                                     chunk=args.render_chunk)
            m = evaluate_image(rgb, gts_point[i])
            views.append({
                "image": i,
                "psnr": round(m["psnr"], 2),
                "ssim": round(m["ssim"], 4),
                "psnr_vs_supersampled_gt": round(psnr(rgb, gts_super[i]), 2),
            })
        entry = {
            "step": at_step,
            "views": views,
            "mean_psnr": round(float(np.mean([v["psnr"] for v in views])), 2),
            "mean_ssim": round(
                float(np.mean([v["ssim"] for v in views])), 4),
            "mean_psnr_vs_supersampled_gt": round(
                float(np.mean([v["psnr_vs_supersampled_gt"] for v in views])),
                2),
        }
        print(f"step {at_step:>7d}: held-out "
              f"psnr {entry['mean_psnr']} ssim {entry['mean_ssim']} "
              f"vs-supersampled {entry['mean_psnr_vs_supersampled_gt']}",
              flush=True)
        return entry

    curve = []        # train-psnr curve (every dispatch)
    heldout_curve = []
    t0 = time.perf_counter()
    step = 0
    while step < args.steps:
        k = min(args.steps_per_call, args.steps - step,
                (step // args.eval_every + 1) * args.eval_every - step)
        if k > 1:
            batches = [next(ds) for _ in range(k)]
            rays_stack = Rays(*[
                jnp.asarray(np.stack([np.asarray(b[0][i]) for b in batches]))
                for i in range(len(batches[0][0]))
            ])
            pixels_stack = jnp.asarray(
                np.stack([np.asarray(b[1]) for b in batches])
            )
            state, stacked = multi(state, rays_stack, pixels_stack)
            stats = jax.tree.map(lambda a: a[-1], stacked)
            # Sync each dispatch: unbounded async queues through the
            # tunnel intermittently wedge (~200 queued dispatches hung
            # the round-5 400k run at step 200k); one ~54 ms fetch per
            # 250 steps is a 0.2 ms/step robustness tax.
            float(stats.loss)
        else:
            rays, pixels = next(ds)
            state, stats = single(
                state, Rays(*map(jnp.asarray, rays)), jnp.asarray(pixels)
            )
        step += k
        curve.append({"step": step,
                      "train_psnr": round(float(stats.psnr), 3),
                      "loss": round(float(stats.loss), 6)})
        if step % args.eval_every == 0 or step == args.steps:
            heldout_curve.append(eval_heldout(state.params, step))
    train_s = time.perf_counter() - t0
    ds.close()

    final = heldout_curve[-1]
    record = {
        "scene": args.scene, "size": size, "ss": ss,
        "steps": args.steps, "batch_size": args.batch_size,
        "lr": [cfg.lr_init, cfg.lr_final, cfg.lr_delay_steps],
        "aliasing_ceiling_psnr_per_view": [round(c, 2) for c in ceiling],
        "aliasing_ceiling_psnr": round(float(np.mean(ceiling)), 2),
        "train_seconds": round(train_s, 1),
        "train_curve": curve,
        "heldout_curve": heldout_curve,
    }
    os.makedirs(ARTIFACTS, exist_ok=True)
    suffix = "" if size == 256 else f"_{size}"
    path = os.path.join(ARTIFACTS, f"quality_curve_flagship{suffix}.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=1)

    print(json.dumps({
        "metric": "flagship_heldout_psnr",
        "value": final["mean_psnr"],
        "unit": "dB",
        "ssim": final["mean_ssim"],
        "psnr_vs_supersampled_gt": final["mean_psnr_vs_supersampled_gt"],
        "aliasing_ceiling_psnr": record["aliasing_ceiling_psnr"],
        "steps": args.steps,
        "train_seconds": record["train_seconds"],
        "curve_artifact": path,
    }))


if __name__ == "__main__":
    main()
