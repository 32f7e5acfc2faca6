"""Integration: train on a consistent multi-view scene -> PSNR threshold.

The BASELINE "overfit + short-run PSNR curve" gate (SURVEY.md §4) on the
analytic sphere scene (no Blender data exists offline). A broken model
component — sampling, IPE, rendering, optimizer — caps PSNR near the
white-background floor; a working one reconstructs the scene.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_or_nothing_tpu.config import DatasetType, tiny_config
from nerf_or_nothing_tpu.datasets.base import create_dataset
from nerf_or_nothing_tpu.eval import evaluate_image, make_render_fn, render_image
from nerf_or_nothing_tpu.rays import Rays
from nerf_or_nothing_tpu.train import init_train_state, make_jitted_train_step
from nerf_or_nothing_tpu.utils.synthetic import write_scene


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return write_scene(str(tmp_path_factory.mktemp("sphere_scene")),
                       n_train=10, n_test=2, size=48)


def test_short_training_reconstructs_scene(scene):
    cfg = tiny_config(
        batch_size=512, num_samples=48, num_levels=2,
        net_depth=4, net_width=96, net_width_condition=48,
        max_deg_point=8, deg_view=4,
        lr_init=5e-3, lr_final=5e-4, lr_delay_steps=0, max_steps=600,
        dataset_loader=DatasetType.BLENDER,
    )
    ds = create_dataset("train", scene, cfg)
    state = init_train_state(cfg)
    step = make_jitted_train_step(cfg)
    first_psnr = None
    for i in range(600):
        rays, pixels = next(ds)
        state, stats = step(
            state, Rays(*[jnp.asarray(x) for x in rays]),
            jnp.asarray(pixels),
        )
        if first_psnr is None:
            first_psnr = float(stats.psnr)
    train_psnr = float(stats.psnr)
    assert train_psnr > 20.0, (first_psnr, train_psnr)

    # held-out view
    test_ds = create_dataset("test", scene, cfg)
    rays, gt = test_ds.image_rays(0)
    rgb, _, _ = render_image(
        make_render_fn(cfg), state.params,
        Rays(*[jnp.asarray(x) for x in rays]),
        test_ds.height, test_ds.width, chunk=2048,
    )
    m = evaluate_image(rgb, np.asarray(gt).reshape(48, 48, 3))
    assert m["psnr"] > 18.0, m
    assert m["ssim"] > 0.6, m
