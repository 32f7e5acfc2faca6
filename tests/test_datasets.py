"""Dataset loaders: synthesized fixtures on disk, batching, bin roundtrip."""

import json
import os

import numpy as np
import pytest

from nerf_or_nothing_tpu.config import Config, DatasetType
from nerf_or_nothing_tpu.datasets import bin_dump
from nerf_or_nothing_tpu.datasets.base import create_dataset
from nerf_or_nothing_tpu.rays import Rays


def write_blender_scene(root, n_frames=3, size=16):
    """Minimal Blender-format scene: RGBA PNGs + transforms_{split}.json."""
    from PIL import Image

    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(n_frames):
        img = (rng.uniform(0, 255, size=(size, size, 4))).astype(np.uint8)
        img[..., 3] = 255
        Image.fromarray(img, "RGBA").save(
            os.path.join(root, "train", f"r_{i}.png")
        )
        theta = 2 * np.pi * i / n_frames
        c2w = np.eye(4)
        c2w[:3, 3] = [4 * np.cos(theta), 4 * np.sin(theta), 0.5]
        frames.append(
            {"file_path": f"train/r_{i}", "transform_matrix": c2w.tolist()}
        )
    meta = {"camera_angle_x": 0.6911, "frames": frames}
    for split in ("train", "test"):
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("blender"))
    write_blender_scene(root)
    return root


def test_blender_loader(blender_dir):
    cfg = Config(
        dataset_loader=DatasetType.BLENDER, data_dir=blender_dir,
        batch_size=32,
    )
    ds = create_dataset("train", blender_dir, cfg)
    assert ds.images.shape == (3, 16, 16, 3)
    assert ds.rays.origins.shape == (3, 16, 16, 3)
    # viewdirs normalized
    n = np.linalg.norm(ds.rays.viewdirs, axis=-1)
    np.testing.assert_allclose(n, 1.0, rtol=1e-5)
    # radii positive and of pixel-footprint magnitude
    assert (ds.rays.radii > 0).all()
    rays, pixels = next(ds)
    assert pixels.shape == (32, 3)
    assert rays.origins.shape == (32, 3)


def test_blender_batches_are_random_but_seeded(blender_dir):
    cfg = Config(dataset_loader=DatasetType.BLENDER, batch_size=16, seed=7)
    ds1 = create_dataset("train", blender_dir, cfg)
    ds2 = create_dataset("train", blender_dir, cfg)
    r1, p1 = ds1.peek()
    r2, p2 = ds2.peek()
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(r1.origins, r2.origins)


def test_peek_mid_iteration_deterministic(blender_dir):
    """peek() after the prefetch worker has started must (a) equal the next
    batch, (b) not consume it twice, and (c) not perturb the stream — the
    old save/restore of self._rng raced the worker thread."""
    cfg = Config(dataset_loader=DatasetType.BLENDER, batch_size=16, seed=11)
    plain = create_dataset("train", blender_dir, cfg)
    reference = [next(plain)[1] for _ in range(6)]

    ds = create_dataset("train", blender_dir, cfg)
    got = [next(ds)[1]]  # starts the worker
    peeked = ds.peek()[1]
    peeked_again = ds.peek()[1]  # repeated peek: same batch, not consumed
    np.testing.assert_array_equal(peeked, peeked_again)
    got.append(next(ds)[1])
    np.testing.assert_array_equal(peeked, got[-1])
    for _ in range(4):
        ds.peek()
        got.append(next(ds)[1])
    for want, have in zip(reference, got):
        np.testing.assert_array_equal(want, have)


def test_image_rays_roundtrip(blender_dir):
    cfg = Config(dataset_loader=DatasetType.BLENDER, batch_size=16)
    ds = create_dataset("test", blender_dir, cfg)
    rays, gt = ds.image_rays(0)
    assert rays.origins.shape == (16 * 16, 3)
    assert gt.shape == (16 * 16, 3)


def test_bin_dump_roundtrip(tmp_path):
    """write_bin_dump -> BinDataset reproduces the 64-byte record format of
    BinDataset.cs:40-49 bit-exactly."""
    rng = np.random.default_rng(1)
    n = 100
    d = rng.normal(size=(n, 3)).astype(np.float32)
    rays = Rays(
        rng.normal(size=(n, 3)).astype(np.float32),
        d,
        (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32),
        rng.uniform(0.001, 0.01, size=(n, 1)).astype(np.float32),
        np.full((n, 1), 2.0, np.float32),
        np.full((n, 1), 6.0, np.float32),
        np.ones((n, 1), np.float32),
    )
    pixels = rng.uniform(size=(n, 3)).astype(np.float32)
    path = str(tmp_path / "rays.bin")
    bin_dump.write_bin_dump(path, rays, pixels)
    assert os.path.getsize(path) == n * 64

    cfg = Config(dataset_loader=DatasetType.BIN, batch_size=16)
    ds = create_dataset("train", path, cfg)
    assert ds.pool_size == n
    np.testing.assert_array_equal(
        ds._flat_rays.origins, rays.origins
    )
    np.testing.assert_array_equal(ds._flat_pixels, pixels)
    batch_rays, batch_pixels = next(ds)
    assert batch_pixels.shape == (16, 3)


def test_multicam_synthesized(blender_dir):
    cfg = Config(dataset_loader=DatasetType.MULTICAM, batch_size=8)
    ds = create_dataset("train", blender_dir, cfg)
    # 3 frames x 4 scales; pool = sum of 16^2 + 8^2 + 4^2 + 2^2 per frame
    expected = 3 * (256 + 64 + 16 + 4)
    assert ds.pool_size == expected
    # area weights present: lossmult in {1,4,16,64}
    lm = np.unique(ds._flat_rays.loss_mult)
    np.testing.assert_array_equal(lm, [1.0, 4.0, 16.0, 64.0])
    rays, pixels = next(ds)
    assert pixels.shape == (8, 3)


def test_multicam_eval_end_to_end(blender_dir):
    """Train briefly on the synthesized 4-scale pyramid, then evaluate a
    held-out multicam view — the mixed-resolution eval path (each scale has
    its own H x W; a uniform dataset.height/width reshape would crash)."""
    import jax.numpy as jnp

    from nerf_or_nothing_tpu.config import tiny_config
    from nerf_or_nothing_tpu.eval import evaluate_dataset
    from nerf_or_nothing_tpu.train import (
        init_train_state,
        make_jitted_train_step,
    )

    cfg = tiny_config(
        batch_size=16, num_samples=8, net_depth=2, net_width=16,
        net_width_condition=8, max_deg_point=4,
        dataset_loader=DatasetType.MULTICAM, render_chunk_size=64,
    )
    ds = create_dataset("train", blender_dir, cfg)
    state = init_train_state(cfg)
    step = make_jitted_train_step(cfg)
    for _ in range(2):
        rays, pixels = next(ds)
        state, stats = step(
            state, Rays(*[jnp.asarray(x) for x in rays]), jnp.asarray(pixels)
        )
    assert np.isfinite(float(stats.loss))

    test_ds = create_dataset("test", blender_dir, cfg)
    dims = {test_ds.image_dims(i) for i in range(test_ds.num_images)}
    assert len(dims) == 4, dims  # all four pyramid scales present
    metrics = evaluate_dataset(cfg, state.params, test_ds, max_images=5)
    assert np.isfinite(metrics["psnr"])
    assert 0.0 <= metrics["ssim"] <= 1.0


def test_train_on_blender_smoke(blender_dir):
    """End-to-end: dataset -> train step -> finite loss."""
    import jax.numpy as jnp

    from nerf_or_nothing_tpu.config import tiny_config
    from nerf_or_nothing_tpu.train import (
        init_train_state,
        make_jitted_train_step,
    )

    cfg = tiny_config(
        batch_size=16, num_samples=8, net_depth=2, net_width=16,
        net_width_condition=8, max_deg_point=4,
        dataset_loader=DatasetType.BLENDER,
    )
    ds = create_dataset("train", blender_dir, cfg)
    state = init_train_state(cfg)
    step = make_jitted_train_step(cfg)
    rays, pixels = next(ds)
    state, stats = step(
        state, Rays(*[jnp.asarray(x) for x in rays]), jnp.asarray(pixels)
    )
    assert np.isfinite(float(stats.loss))


def write_llff_scene(root, n_images=6, size=12):
    """Synthetic LLFF scene: images/ + poses_bounds.npy (canonical layout)."""
    from PIL import Image

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    rng = np.random.default_rng(3)
    rows = []
    focal = 20.0
    for i in range(n_images):
        img = rng.uniform(0, 255, size=(size, size, 3)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "images", f"im_{i}.png"))
        # forward-facing-ish cameras: small offsets, looking down -z
        c2w = np.eye(4)[:3]
        c2w[:, 3] = [0.1 * i, 0.05 * i, 0.1]
        # poses_bounds row: [3x5 pose (pose|hwf)] + [near far]
        hwf = np.asarray([size, size, focal])[:, None]
        row = np.concatenate([np.concatenate([c2w, hwf], 1).ravel(),
                              [1.0, 10.0]])
        rows.append(row)
    np.save(os.path.join(root, "poses_bounds.npy"), np.stack(rows))


@pytest.fixture(scope="module")
def llff_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("llff"))
    write_llff_scene(root)
    return root


def test_llff_loader_ndc(llff_dir):
    cfg = Config(dataset_loader=DatasetType.LLFF, batch_size=16, llff_hold=3)
    ds = create_dataset("train", llff_dir, cfg)
    # 6 images, hold every 3rd -> 4 train / 2 test
    assert ds.images.shape[0] == 4
    ds_test = create_dataset("test", llff_dir, cfg)
    assert ds_test.images.shape[0] == 2
    # NDC: near/far are 0/1 and ray dirs have positive z-ish structure
    np.testing.assert_allclose(ds.rays.near, 0.0)
    np.testing.assert_allclose(ds.rays.far, 1.0)
    assert (ds.rays.radii > 0).all()
    rays, pixels = next(ds)
    assert pixels.shape == (16, 3)


def test_llff_spherify(llff_dir):
    cfg = Config(dataset_loader=DatasetType.LLFF, batch_size=8,
                 spherify=True, llff_hold=3)
    ds = create_dataset("train", llff_dir, cfg)
    # spherified: circular render path, non-NDC near/far from bounds
    assert ds.render_poses is not None
    assert ds.render_poses.shape[1:] == (3, 4)
    assert float(ds.rays.near[0, 0, 0, 0]) > 0.0
    path = ds.render_path_rays()
    assert len(path) == 120
    rays0, (h, w) = path[0]
    assert (h, w) == ds.rays.origins.shape[1:3]
    assert rays0.origins.shape == (h * w, 3)


def test_llff_spiral_render_path(llff_dir):
    cfg = Config(dataset_loader=DatasetType.LLFF, batch_size=8,
                 render_path=True, llff_hold=3)
    ds = create_dataset("train", llff_dir, cfg)
    assert ds.render_poses is not None
    assert len(ds.render_path_rays()) == 120


def test_close_joins_prefetch_worker(blender_dir):
    """close() stops and joins the prefetch thread even with a full queue
    and no consumer (VERDICT r3: the unstoppable-daemon-loop flake)."""
    cfg = Config(
        dataset_loader=DatasetType.BLENDER, data_dir=blender_dir,
        batch_size=8,
    )
    ds = create_dataset("train", blender_dir, cfg)
    next(ds)  # starts the worker
    worker = ds._thread
    assert worker is not None and worker.is_alive()
    # Let the worker fill the queue and block on put; close must still join.
    import time

    time.sleep(0.3)
    ds.close()
    assert not worker.is_alive()
    ds.close()  # idempotent
    with pytest.raises(RuntimeError):
        next(ds)  # a closed dataset refuses to restart its worker


def test_dataset_context_manager(blender_dir):
    cfg = Config(
        dataset_loader=DatasetType.BLENDER, data_dir=blender_dir,
        batch_size=8,
    )
    with create_dataset("train", blender_dir, cfg) as ds:
        rays, pixels = next(ds)
        assert pixels.shape == (8, 3)
        worker = ds._thread
    assert worker is None or not worker.is_alive()


def test_linear_color_linearizes_images(blender_dir):
    """Config.linear_color decodes sRGB pixels at load; linear_to_srgb of
    the stored images reproduces the original PNG values."""
    import jax.numpy as jnp

    from nerf_or_nothing_tpu.ops.math_utils import linear_to_srgb

    base = Config(dataset_loader=DatasetType.BLENDER, data_dir=blender_dir,
                  batch_size=8)
    ds_display = create_dataset("train", blender_dir, base)
    ds_linear = create_dataset(
        "train", blender_dir, base.replace(linear_color=True)
    )
    np.testing.assert_allclose(
        np.asarray(linear_to_srgb(jnp.asarray(ds_linear.images))),
        ds_display.images, atol=1e-5,
    )
    # linear values are <= their sRGB encoding on [0, 1]
    assert np.all(ds_linear.images <= ds_display.images + 1e-6)


def test_blender_orbit_path_geometry(blender_dir):
    """Orbit render path: flat rays at image dims, cameras on a circle of
    the scene's pose radius, all looking at the origin."""
    cfg = Config(dataset_loader=DatasetType.BLENDER, data_dir=blender_dir,
                 batch_size=8, render_path=True)
    ds = create_dataset("test", blender_dir, cfg)
    frames = ds.render_path_rays(n_frames=8)
    assert len(frames) == 8
    rays, (h, w) = frames[0]
    assert rays.origins.shape == (h * w, 3)
    for rays, _ in frames:
        o = rays.origins[0]
        assert np.linalg.norm(o) == pytest.approx(ds._pose_radius, rel=1e-4)
        # the central ray points at the origin
        center = rays.viewdirs[(h // 2) * w + w // 2]
        to_origin = -o / np.linalg.norm(o)
        assert float(np.dot(center, to_origin)) > 0.99
