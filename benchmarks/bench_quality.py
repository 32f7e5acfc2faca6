"""Quality benchmark: training runs on the analytic ray-traced scenes.

BASELINE's quality target (Blender ``lego`` PSNR parity) needs the real
dataset, which is not shipped offline; this harness is the runnable
quality gate on exact analytic ground truth (``utils/synthetic.py``):

- default: the HARD scene (procedurally textured, self-occluding sphere
  ring + checkered ground + cast shadows — NeRF-scene-like frequency
  content, far above the 4-flat-sphere smoke scene),
- ``--full``: config-3 scale (8x256 MLP, hierarchical 128+128),
- ``--multiscale``: the BASELINE config-4 variant — trains on the
  synthesized 4-scale multicam pyramid with area-weighted loss and
  evaluates every held-out scale.

Records a PSNR-vs-step curve (train PSNR sampled every ``--curve-every``
steps, held-out PSNR at the end) into ``benchmarks/artifacts/`` and prints
ONE JSON line:
  {"metric": "synthetic_heldout_psnr", "value": ..., "unit": "dB", ...}

Reference points measured on one TPU v5e (fused-level kernels, 2026-08):
- hard scene, default 4x128 / 64+64, 3000 steps / ~27 s: ~18.7 dB held-out
- hard scene, --full (8x256, 128+128), 20000 steps / 151 s: train 37.7 dB,
  held-out 21.2 dB / 0.912 SSIM (gap is scene-intrinsic: hard shadows +
  binary checkers are view-sensitive at 64x64)
- anything under ~17 dB held-out indicates a numerics regression in the
  compiled kernels (the CPU suite runs them in interpret mode; this
  harness exercises real Mosaic).
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
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--scene", choices=("simple", "hard"), default="hard")
    p.add_argument("--full", action="store_true",
                   help="config-3 scale: 8x256 MLP, 128+128 samples")
    p.add_argument("--multiscale", action="store_true",
                   help="config-4 variant: 4-scale multicam pyramid")
    p.add_argument("--curve-every", type=int, default=250)
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
        init_train_state, make_jitted_train_step,
    )
    from nerf_or_nothing_tpu.utils.synthetic import write_scene

    root = tempfile.mkdtemp()
    # 24 views over two elevation rings: the hard scene's shadows and
    # high-frequency texture need real view coverage for held-out
    # generalization (10 single-ring views measured ~12 dB of overfit gap).
    write_scene(root, n_train=24, n_test=3, size=args.size, scene=args.scene)

    model = (
        dict(num_samples=128, num_levels=2, net_depth=8, net_width=256,
             net_width_condition=128)
        if args.full
        else dict(num_samples=64, num_levels=2, net_depth=4, net_width=128,
                  net_width_condition=64)
    )
    cfg = Config(
        batch_size=args.batch_size,
        dataset_loader=(
            DatasetType.MULTICAM if args.multiscale else DatasetType.BLENDER
        ),
        lr_delay_steps=100, lr_init=1e-3, lr_final=1e-4,
        max_steps=args.steps, **model,
    )
    ds = create_dataset("train", root, cfg)
    state = init_train_state(cfg)
    step = make_jitted_train_step(cfg)

    curve = []
    t0 = time.perf_counter()
    stats = None
    for i in range(1, args.steps + 1):
        rays, pixels = next(ds)
        state, stats = step(
            state, Rays(*map(jnp.asarray, rays)), jnp.asarray(pixels)
        )
        if i % args.curve_every == 0 or i == args.steps:
            # one scalar fetch per curve point (syncs the device)
            curve.append(
                {"step": i, "train_psnr": round(float(stats.psnr), 3),
                 "loss": round(float(stats.loss), 6)}
            )
    train_psnr = curve[-1]["train_psnr"]
    train_s = time.perf_counter() - t0

    test = create_dataset("test", root, cfg)
    render_fn = make_render_fn(cfg)
    n_eval = min(4, test.num_images) if args.multiscale else 1
    heldout = []
    for i in range(n_eval):
        rays, gt = test.image_rays(i)
        h, w = test.image_dims(i)
        rgb, _, _ = render_image(
            render_fn, state.params, Rays(*map(jnp.asarray, rays)),
            h, w, chunk=4096,
        )
        m = evaluate_image(rgb, np.asarray(gt).reshape(h, w, 3))
        heldout.append({"image": i, "dims": [h, w],
                        "psnr": round(m["psnr"], 2),
                        "ssim": round(m["ssim"], 4)})

    os.makedirs(ARTIFACTS, exist_ok=True)
    tag = "_".join(
        [args.scene]
        + (["full"] if args.full else [])
        + (["multiscale"] if args.multiscale else [])
    )
    artifact = os.path.join(ARTIFACTS, f"quality_curve_{tag}.json")
    record = {
        "scene": args.scene, "full": args.full,
        "multiscale": args.multiscale, "steps": args.steps,
        "size": args.size, "batch_size": args.batch_size,
        "train_seconds": round(train_s, 1),
        "curve": curve, "heldout": heldout,
    }
    with open(artifact, "w") as f:
        json.dump(record, f, indent=1)

    print(json.dumps({
        "metric": "synthetic_heldout_psnr",
        "value": heldout[0]["psnr"],
        "unit": "dB",
        "scene": args.scene,
        "train_psnr": train_psnr,
        "ssim": heldout[0]["ssim"],
        "heldout": heldout,
        "steps": args.steps,
        "train_seconds": round(train_s, 1),
        "curve_artifact": artifact,
    }))


if __name__ == "__main__":
    main()
