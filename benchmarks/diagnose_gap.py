"""Diagnose the train/held-out PSNR gap on the analytic quality-gate scene.

Round-2 review: the 16 dB train/held-out gap was *asserted* to be
scene-intrinsic; this harness measures it. The scene is analytic, so every
hypothesis has an exact experiment:

1. **Aliasing ceiling** — the test images are point-sampled; a mip-NeRF
   learns the average radiance over each pixel's cone footprint. The best
   PSNR any footprint-averaging renderer can score against point-sampled
   binary checkers is PSNR(point-sampled GT, supersampled GT) at the same
   resolution. Computed exactly via ``--ss``x``--ss`` supersampling.
2. **Model vs supersampled GT** — if the trained model scores much higher
   against the footprint-averaged GT than against the point-sampled GT,
   it has learned the correct (anti-aliased) radiance field and the gap IS
   the aliasing floor, not a sampling/encoding bug.
3. **Near-train held-out views** — render views azimuthally interpolated
   between adjacent train cameras (same rings). If these score like the far
   test views, the gap is not view extrapolation/overfit.
4. **no-IPE (plain PE) control** — train the identical model with
   radii ~ 0 (IPE variance -> 0 degenerates the encoding to classic PE of
   sample means). IPE must match or beat it on held-out views for the
   mip-NeRF encoding to be earning its cost.

Writes ``benchmarks/artifacts/gap_diagnosis.json`` and prints one JSON line.
Reference eval-math intent: MipHelpers.cs:669-736 (PSNR/SSIM declared but
never wired in the reference).
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
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--ss", type=int, default=4, help="supersampling factor")
    p.add_argument("--scene", default="hard")
    p.add_argument("--full", action="store_true")
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
    from nerf_or_nothing_tpu.ops.math_utils import mse_to_psnr
    from nerf_or_nothing_tpu.rays import Rays, generate_rays, pinhole_pix_to_cam
    from nerf_or_nothing_tpu.train import (
        init_train_state, make_jitted_train_step,
    )
    from nerf_or_nothing_tpu.utils import synthetic

    size, ss = args.size, args.ss
    angle = 0.8
    root = tempfile.mkdtemp()
    synthetic.write_scene(root, n_train=24, n_test=3, size=size,
                          scene=args.scene)

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
        hi = synthetic.render_rays_analytic(
            np.asarray(r.origins).reshape(-1, 3),
            np.asarray(r.directions).reshape(-1, 3), scene=args.scene,
        ).reshape(size, ss, size, ss, 3).mean(axis=(1, 3))
        return hi

    def psnr(a, b):
        return float(mse_to_psnr(jnp.mean((jnp.asarray(a) - b) ** 2)))

    # Camera sets: the written test views (offset ring) + views midway
    # between adjacent TRAIN cameras on the training rings.
    test_poses = []
    for i in range(3):
        theta = 2.0 * np.pi * (i + 0.33) / 3
        eye = 4.0 * np.array([
            np.cos(theta) * np.cos(0.45), np.sin(theta) * np.cos(0.45),
            np.sin(0.45),
        ])
        test_poses.append(synthetic._look_at(eye))
    near_train_poses = []
    for i in range(3):
        # midway in azimuth between train views 2i and 2i+2 (same ring)
        theta = 2.0 * np.pi * (2 * i + 1) / 24
        el = 0.45 - 0.12  # the even-index training ring elevation
        eye = 4.0 * np.array([
            np.cos(theta) * np.cos(el), np.sin(theta) * np.cos(el),
            np.sin(el),
        ])
        near_train_poses.append(synthetic._look_at(eye))

    # 1. Aliasing ceiling (no model involved).
    ceiling = [psnr(gt_point(c), gt_supersampled(c)) for c in test_poses]

    # Train twice: standard (IPE) and radii->0 (plain PE control).
    model = (
        dict(num_samples=128, num_levels=2, net_depth=8, net_width=256,
             net_width_condition=128)
        if args.full
        else dict(num_samples=64, num_levels=2, net_depth=4, net_width=128,
                  net_width_condition=64)
    )

    def train_model(kill_radii):
        cfg = Config(batch_size=1024,
                     dataset_loader=DatasetType.BLENDER,
                     lr_delay_steps=100, lr_init=1e-3, lr_final=1e-4,
                     max_steps=args.steps, **model)
        ds = create_dataset("train", root, cfg)
        if kill_radii:
            ds._flat_rays = ds._flat_rays._replace(
                radii=np.full_like(ds._flat_rays.radii, 1e-6))
        state = init_train_state(cfg)
        step = make_jitted_train_step(cfg)
        stats = None
        for i in range(args.steps):
            rays, pixels = next(ds)
            state, stats = step(state, Rays(*map(jnp.asarray, rays)),
                                jnp.asarray(pixels))
        train_psnr = float(stats.psnr)
        render_fn = make_render_fn(cfg)

        def render_pose(c2w):
            r = pose_rays(c2w, size)
            r = Rays(*[jnp.asarray(np.asarray(x).reshape(-1, x.shape[-1]))
                       for x in r])
            if kill_radii:
                r = r._replace(radii=jnp.full_like(r.radii, 1e-6))
            rgb, _, _ = render_image(render_fn, state.params, r, size, size,
                                     chunk=8192)
            return np.asarray(rgb)

        out = {"train_psnr": round(train_psnr, 2)}
        for name, poses in (("test", test_poses),
                            ("near_train", near_train_poses)):
            vs_point, vs_super, ssim = [], [], []
            for c in poses:
                img = render_pose(c)
                m = evaluate_image(img, gt_point(c))
                vs_point.append(m["psnr"])
                ssim.append(m["ssim"])
                vs_super.append(psnr(img, gt_supersampled(c)))
            out[name] = {
                "psnr_vs_point_gt": round(float(np.mean(vs_point)), 2),
                "psnr_vs_supersampled_gt": round(float(np.mean(vs_super)), 2),
                "ssim": round(float(np.mean(ssim)), 4),
            }
        return out

    t0 = time.perf_counter()
    ipe_res = train_model(kill_radii=False)
    pe_res = train_model(kill_radii=True)

    record = {
        "scene": args.scene, "size": size, "ss": ss, "steps": args.steps,
        "full": args.full,
        "aliasing_ceiling_psnr_per_view": [round(c, 2) for c in ceiling],
        "aliasing_ceiling_psnr": round(float(np.mean(ceiling)), 2),
        "ipe": ipe_res,
        "plain_pe_control": pe_res,
        "seconds": round(time.perf_counter() - t0, 1),
    }
    os.makedirs(ARTIFACTS, exist_ok=True)
    path = os.path.join(ARTIFACTS, "gap_diagnosis.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=1)

    print(json.dumps({
        "metric": "gap_diagnosis",
        "aliasing_ceiling_db": record["aliasing_ceiling_psnr"],
        "ipe_heldout_vs_point": ipe_res["test"]["psnr_vs_point_gt"],
        "ipe_heldout_vs_supersampled":
            ipe_res["test"]["psnr_vs_supersampled_gt"],
        "ipe_near_train_vs_point":
            ipe_res["near_train"]["psnr_vs_point_gt"],
        "pe_heldout_vs_point": pe_res["test"]["psnr_vs_point_gt"],
        "train_psnr": ipe_res["train_psnr"],
        "artifact": path,
    }))


if __name__ == "__main__":
    main()
