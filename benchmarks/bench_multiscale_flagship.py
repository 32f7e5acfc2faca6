"""Flagship multiscale run (VERDICT r4 #4): long-horizon training on the
4-scale Multicam pyramid with per-scale held-out CURVES and the
area-weight on/off ablation at length.

The area-weighted multiscale loss is the reference ``LossFn``'s whole
point (Program.cs:66-89; 4^scale lossMult from the pyramid the reference's
``Multicam.LoadRenderings`` stubs out, Dataset.cs:203-212) — this harness
runs it at flagship length:

- trains the full model (8x256, hierarchical 128+128) >=50k steps on the
  synthesized 4-scale pyramid of the hard analytic scene;
- every ``--eval-every`` steps renders ALL held-out views at ALL 4 scales
  and records per-scale PSNR/SSIM — a curve, not one number;
- trains the SAME config a second time with ``disable_multiscale_loss``
  (mask = 1, Program.cs:70 semantics — area weights OFF) and records the
  same curve, so the area-weighting's contribution is measured at length.

Writes ``benchmarks/artifacts/quality_curve_multiscale_flagship.json``
and prints ONE JSON line.
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
    p.add_argument("--steps", type=int, default=50_000)
    p.add_argument("--size", type=int, default=256,
                   help="full-resolution scale (pyramid: size/1..size/8)")
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--scene", default="hard")
    p.add_argument("--eval-every", type=int, default=10_000)
    p.add_argument("--steps-per-call", type=int, default=250)
    p.add_argument("--skip-ablation", action="store_true")
    p.add_argument("--fast-ipe", action="store_true")
    p.add_argument("--smoke", action="store_true",
                   help="tiny model + plain XLA (CPU harness check only)")
    args = p.parse_args()

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp
    import numpy as np

    from nerf_or_nothing_tpu.config import Config, DatasetType
    from nerf_or_nothing_tpu.datasets.base import create_dataset
    from nerf_or_nothing_tpu.eval import (
        evaluate_image, make_render_fn, render_image,
    )
    from nerf_or_nothing_tpu.rays import Rays
    from nerf_or_nothing_tpu.train import (
        init_train_state, make_jitted_multi_step, make_jitted_train_step,
    )
    from nerf_or_nothing_tpu.utils.synthetic import write_scene

    root = tempfile.mkdtemp()
    t0 = time.perf_counter()
    write_scene(root, n_train=24, n_test=3, size=args.size,
                scene=args.scene)
    print(f"scene in {time.perf_counter() - t0:.0f}s", flush=True)
    n_scales = 4

    smoke_kw = (
        dict(num_samples=16, net_depth=3, net_width=32,
             net_width_condition=16, skip_layer=2, max_deg_point=6,
             use_pallas=False)
        if args.smoke else {}
    )

    def run(disable_area_weights: bool):
        cfg = Config(
            batch_size=args.batch_size,
            dataset_loader=DatasetType.MULTICAM,
            disable_multiscale_loss=disable_area_weights,
            lr_init=5e-4, lr_final=5e-6, lr_delay_steps=2500,
            lr_delay_mult=0.01, max_steps=args.steps,
            fast_ipe=args.fast_ipe,
            **smoke_kw,
        )
        ds = create_dataset("train", root, cfg)
        test = create_dataset("test", root, cfg)
        state = init_train_state(cfg)
        multi = make_jitted_multi_step(cfg)
        single = make_jitted_train_step(cfg)
        render_fn = make_render_fn(cfg)

        def eval_heldout(params, at_step):
            per_scale = {s: {"psnr": [], "ssim": []}
                         for s in range(n_scales)}
            for i in range(test.num_images):
                scale = i % n_scales  # (view-major, scale-minor)
                rays, gt = test.image_rays(i)
                h, w = test.image_dims(i)
                rgb, _, _ = render_image(
                    render_fn, params, Rays(*map(jnp.asarray, rays)),
                    h, w, chunk=8192,
                )
                m = evaluate_image(rgb, np.asarray(gt).reshape(h, w, 3))
                per_scale[scale]["psnr"].append(m["psnr"])
                per_scale[scale]["ssim"].append(m["ssim"])
            entry = {"step": at_step}
            for s in range(n_scales):
                entry[f"scale_{s}_psnr"] = round(
                    float(np.mean(per_scale[s]["psnr"])), 2)
                entry[f"scale_{s}_ssim"] = round(
                    float(np.mean(per_scale[s]["ssim"])), 4)
            entry["mean_psnr"] = round(float(np.mean(
                [entry[f"scale_{s}_psnr"] for s in range(n_scales)])), 2)
            print(f"  step {at_step:>7d}: per-scale psnr "
                  f"{[entry[f'scale_{s}_psnr'] for s in range(n_scales)]}",
                  flush=True)
            return entry

        heldout_curve = []
        step = 0
        t_train = time.perf_counter()
        while step < args.steps:
            k = min(args.steps_per_call, args.steps - step,
                    (step // args.eval_every + 1) * args.eval_every - step)
            if k > 1:
                batches = [next(ds) for _ in range(k)]
                rays_stack = Rays(*[
                    jnp.asarray(
                        np.stack([np.asarray(b[0][i]) for b in batches]))
                    for i in range(len(batches[0][0]))
                ])
                pixels_stack = jnp.asarray(
                    np.stack([np.asarray(b[1]) for b in batches]))
                state, stacked = multi(state, rays_stack, pixels_stack)
                stats = jax.tree.map(lambda a: a[-1], stacked)
                # sync per dispatch: unbounded tunnel queues wedge
                float(stats.loss)
            else:
                rays, pixels = next(ds)
                state, stats = single(
                    state, Rays(*map(jnp.asarray, rays)),
                    jnp.asarray(pixels),
                )
            step += k
            if step % args.eval_every == 0 or step == args.steps:
                heldout_curve.append(eval_heldout(state.params, step))
        ds.close()
        return {
            "disable_multiscale_loss": disable_area_weights,
            "train_seconds": round(time.perf_counter() - t_train, 1),
            "final_train_psnr": round(float(stats.psnr), 2),
            "heldout_curve": heldout_curve,
        }

    print("multiscale (area weights ON):", flush=True)
    weighted = run(disable_area_weights=False)
    record = {
        "scene": args.scene, "size": args.size, "steps": args.steps,
        "batch_size": args.batch_size, "n_scales": n_scales,
        "area_weighted": weighted,
    }
    if not args.skip_ablation:
        print("ablation (area weights OFF, mask=1):", flush=True)
        record["unweighted_ablation"] = run(disable_area_weights=True)

    os.makedirs(ARTIFACTS, exist_ok=True)
    path = os.path.join(
        ARTIFACTS, "quality_curve_multiscale_flagship.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=1)

    final = weighted["heldout_curve"][-1]
    out = {
        "metric": "multiscale_flagship_mean_psnr",
        "value": final["mean_psnr"],
        "unit": "dB",
        "per_scale_psnr": [final[f"scale_{s}_psnr"]
                           for s in range(n_scales)],
        "steps": args.steps,
        "artifact": path,
    }
    if "unweighted_ablation" in record:
        fu = record["unweighted_ablation"]["heldout_curve"][-1]
        out["unweighted_per_scale_psnr"] = [
            fu[f"scale_{s}_psnr"] for s in range(n_scales)
        ]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
