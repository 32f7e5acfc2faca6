"""Quality benchmark: short training run on the analytic synthetic scene.

BASELINE's quality target (Blender ``lego`` PSNR parity) needs the real
dataset, which is not shipped offline; this harness is the runnable stand-in
quality gate: a ray-traced Lambertian-sphere scene with exact multi-view
ground truth (``utils/synthetic.py``), trained for a few thousand steps with
the full Pallas path, then evaluated on a held-out view.

Prints ONE JSON line:
  {"metric": "synthetic_heldout_psnr", "value": ..., "unit": "dB",
   "train_psnr": ..., "ssim": ..., "steps": N, "train_seconds": ...}

Reference points measured on one TPU v5e (2026-08): 1500 steps / 10.1 s ->
28.4 dB train, 24.9 dB + 0.914 SSIM held-out. Anything under ~20 dB
held-out indicates a numerics regression in the compiled kernels (the CPU
test suite runs them in interpret mode; this harness exercises real Mosaic).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=1024)
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
    write_scene(root, n_train=6, n_test=2, size=args.size)
    cfg = Config(
        batch_size=args.batch_size, dataset_loader=DatasetType.BLENDER,
        num_samples=64, num_levels=2, net_depth=4, net_width=128,
        net_width_condition=64, lr_delay_steps=100,
        lr_init=1e-3, lr_final=1e-4, max_steps=args.steps,
    )
    ds = create_dataset("train", root, cfg)
    state = init_train_state(cfg)
    step = make_jitted_train_step(cfg)

    t0 = time.perf_counter()
    stats = None
    for _ in range(args.steps):
        rays, pixels = next(ds)
        state, stats = step(
            state, Rays(*map(jnp.asarray, rays)), jnp.asarray(pixels)
        )
    train_psnr = float(stats.psnr)  # materializes: syncs the device
    train_s = time.perf_counter() - t0

    test = create_dataset("test", root, cfg)
    rays, gt = test.image_rays(0)
    rgb, _, _ = render_image(
        make_render_fn(cfg), state.params, Rays(*map(jnp.asarray, rays)),
        args.size, args.size, chunk=4096,
    )
    m = evaluate_image(rgb, np.asarray(gt).reshape(args.size, args.size, 3))
    print(json.dumps({
        "metric": "synthetic_heldout_psnr",
        "value": round(m["psnr"], 2),
        "unit": "dB",
        "train_psnr": round(train_psnr, 2),
        "ssim": round(m["ssim"], 4),
        "steps": args.steps,
        "train_seconds": round(train_s, 1),
    }))


if __name__ == "__main__":
    main()
