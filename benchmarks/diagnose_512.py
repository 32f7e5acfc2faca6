"""Diagnose the 512^2 quality gap (VERDICT r4 #3).

Round 4's 512^2 flagship sat 2.02 dB under its same-resolution aliasing
ceiling while the 256^2 run sat only 0.73 dB under — and the model's
PSNR *vs the supersampled GT* was only 0.18 dB above the ceiling at 512^2
(vs 0.87 above at 256^2): the model's reconstruction of the anti-aliased
radiance field itself degrades as resolution rises. This battery isolates
WHY with matched-budget controls at 512^2:

  base      : flagship config (128 samples/level, batch 1024)
  s256      : 256 samples/level (sampling-density hypothesis)
  b4096     : batch 4096 (gradient-noise hypothesis)
  pe_control: radii ~ 0 (plain-PE encode; IPE-is-hurting hypothesis)

Each trains ``--steps`` steps (same step count — b4096 sees 4x rays) and
reports held-out PSNR vs point-sampled AND vs supersampled GT on the test
ring, plus the per-view ceiling. Writes
``benchmarks/artifacts/gap_diagnosis_512.json``.
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
    p.add_argument("--steps", type=int, default=20_000)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--ss", type=int, default=4)
    p.add_argument("--scene", default="hard")
    p.add_argument("--steps-per-call", type=int, default=250)
    p.add_argument("--variants", default="base,s256,b4096,pe_control")
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
        init_train_state, make_jitted_multi_step,
    )
    from nerf_or_nothing_tpu.utils import synthetic

    size, ss = args.size, args.ss
    angle = 0.8
    root = tempfile.mkdtemp()
    t0 = time.perf_counter()
    synthetic.write_scene(root, n_train=24, n_test=3, size=size,
                          scene=args.scene)

    test_poses = []
    for i in range(3):
        theta = 2.0 * np.pi * (i + 0.33) / 3
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
    ceiling = [psnr(gp, gs) for gp, gs in zip(gts_point, gts_super)]
    print(f"scene + GT in {time.perf_counter() - t0:.0f}s; ceiling "
          f"{[round(c, 2) for c in ceiling]}", flush=True)

    VARIANTS = {
        "base": {},
        "s256": {"num_samples": 256},
        "b4096": {"batch_size": 4096},
        "pe_control": {"kill_radii": True},
        # training-length hypothesis: same config, 3x the steps
        "long3x": {"steps_mult": 3},
    }

    def run_variant(name):
        kw = dict(VARIANTS[name])
        kill_radii = kw.pop("kill_radii", False)
        n_steps = args.steps * kw.pop("steps_mult", 1)
        kw.setdefault("batch_size", 1024)
        cfg = Config(
            dataset_loader=DatasetType.BLENDER,
            lr_init=5e-4, lr_final=5e-6, lr_delay_steps=2500,
            lr_delay_mult=0.01, max_steps=n_steps, **kw,
        )
        ds = create_dataset("train", root, cfg)
        if kill_radii:
            ds._flat_rays = ds._flat_rays._replace(
                radii=np.full_like(ds._flat_rays.radii, 1e-6))
        state = init_train_state(cfg)
        multi = make_jitted_multi_step(cfg)
        t1 = time.perf_counter()
        step = 0
        stats = None
        while step < n_steps:
            k = min(args.steps_per_call, n_steps - step)
            batches = [next(ds) for _ in range(k)]
            rays_stack = Rays(*[
                jnp.asarray(np.stack([np.asarray(b[0][i]) for b in batches]))
                for i in range(len(batches[0][0]))
            ])
            pixels_stack = jnp.asarray(
                np.stack([np.asarray(b[1]) for b in batches]))
            state, stacked = multi(state, rays_stack, pixels_stack)
            stats = jax.tree.map(lambda a: a[-1], stacked)
            step += k
        float(stats.loss)  # sync: dispatches are async through the tunnel
        ds.close()
        train_s = time.perf_counter() - t1

        render_fn = make_render_fn(cfg)
        vs_point, vs_super, ssims = [], [], []
        for i, c2w in enumerate(test_poses):
            r = pose_rays(c2w, size)
            r = Rays(*[jnp.asarray(np.asarray(x).reshape(-1, x.shape[-1]))
                       for x in r])
            if kill_radii:
                r = r._replace(radii=jnp.full_like(r.radii, 1e-6))
            rgb, _, _ = render_image(render_fn, state.params, r, size,
                                     size, chunk=16384)
            m = evaluate_image(rgb, gts_point[i])
            vs_point.append(m["psnr"])
            ssims.append(m["ssim"])
            vs_super.append(psnr(rgb, gts_super[i]))
        out = {
            "train_psnr": round(float(stats.psnr), 2),
            "heldout_psnr_vs_point": round(float(np.mean(vs_point)), 2),
            "heldout_psnr_vs_supersampled": round(
                float(np.mean(vs_super)), 2),
            "heldout_ssim": round(float(np.mean(ssims)), 4),
            "train_seconds": round(train_s, 1),
            **{k: v for k, v in VARIANTS[name].items()},
        }
        print(f"{name}: {out}", flush=True)
        return out

    results = {}
    for name in args.variants.split(","):
        results[name] = run_variant(name.strip())

    record = {
        "scene": args.scene, "size": size, "ss": ss, "steps": args.steps,
        "aliasing_ceiling_psnr_per_view": [round(c, 2) for c in ceiling],
        "aliasing_ceiling_psnr": round(float(np.mean(ceiling)), 2),
        "variants": results,
    }
    os.makedirs(ARTIFACTS, exist_ok=True)
    path = os.path.join(ARTIFACTS, "gap_diagnosis_512.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({"metric": "gap_diagnosis_512",
                      "ceiling": record["aliasing_ceiling_psnr"],
                      **{n: r["heldout_psnr_vs_point"]
                         for n, r in results.items()},
                      "artifact": path}))


if __name__ == "__main__":
    main()
