"""Checkpoint save/restore/resume and eval metrics."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from nerf_or_nothing_tpu import checkpoint as ckpt_lib
from nerf_or_nothing_tpu.config import tiny_config
from nerf_or_nothing_tpu.eval import evaluate_image, make_render_fn, render_image
from nerf_or_nothing_tpu.ops.math_utils import compute_ssim, mse_to_psnr
from nerf_or_nothing_tpu.rays import Rays
from nerf_or_nothing_tpu.train import init_train_state, make_jitted_train_step


def small_cfg(**kw):
    base = dict(
        batch_size=16, num_samples=8, net_depth=2, net_width=16,
        net_width_condition=8, max_deg_point=4, donate_params=False,
    )
    base.update(kw)
    return tiny_config(**base)


def make_batch(R, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((R, 1), np.float32)
    rays = Rays(
        jnp.zeros((R, 3)), jnp.asarray(d), jnp.asarray(vd),
        jnp.asarray(ones * 0.005), jnp.asarray(ones * 2.0),
        jnp.asarray(ones * 6.0), jnp.asarray(ones),
    )
    return rays, jnp.asarray(rng.uniform(size=(R, 3)).astype(np.float32))


def test_checkpoint_roundtrip(tmp_path):
    cfg = small_cfg()
    state = init_train_state(cfg)
    rays, pixels = make_batch(cfg.batch_size)
    step = make_jitted_train_step(cfg)
    for _ in range(3):
        state, _ = step(state, rays, pixels)
    path = ckpt_lib.save_checkpoint(str(tmp_path), state)
    assert os.path.exists(path)
    restored = ckpt_lib.restore_checkpoint(path, init_train_state(cfg))
    assert int(restored.step) == 3
    for (w1, b1), (w2, b2) in zip(state.params, restored.params):
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    for (m1, _), (m2, _) in zip(state.mu, restored.mu):
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_resume_reproduces_uninterrupted_run(tmp_path):
    """Train 6 straight vs train 3 + checkpoint + resume + 3: identical
    params (fail-stop recovery semantics, SURVEY.md §5.3/5.4)."""
    cfg = small_cfg(randomized=False)
    rays, pixels = make_batch(cfg.batch_size, seed=2)
    step = make_jitted_train_step(cfg)

    s_straight = init_train_state(cfg)
    for _ in range(6):
        s_straight, _ = step(s_straight, rays, pixels)

    s = init_train_state(cfg)
    for _ in range(3):
        s, _ = step(s, rays, pixels)
    ckpt_lib.save_checkpoint(str(tmp_path), s)
    s_resumed = ckpt_lib.maybe_restore(str(tmp_path), init_train_state(cfg))
    assert int(s_resumed.step) == 3
    for _ in range(3):
        s_resumed, _ = step(s_resumed, rays, pixels)

    for (w1, _), (w2, _) in zip(s_straight.params, s_resumed.params):
        np.testing.assert_allclose(
            np.asarray(w1), np.asarray(w2), rtol=1e-6, atol=1e-7
        )


def test_checkpoint_retention(tmp_path):
    cfg = small_cfg()
    state = init_train_state(cfg)
    for i in range(5):
        state = state._replace(step=jnp.asarray(i + 1))
        ckpt_lib.save_checkpoint(str(tmp_path), state, keep=2)
    files = sorted(os.listdir(str(tmp_path)))
    assert len(files) == 2
    assert ckpt_lib.latest_checkpoint(str(tmp_path)).endswith(
        "checkpoint_000000005.npz"
    )


def test_render_image_chunking():
    cfg = small_cfg()
    state = init_train_state(cfg)
    h = w = 8
    R = h * w
    rays, _ = make_batch(R)
    render_fn = make_render_fn(cfg)
    # chunk smaller than the image and not a divisor of it
    rgb, dist, acc = render_image(render_fn, state.params, rays, h, w,
                                  chunk=24)
    assert rgb.shape == (h, w, 3)
    assert np.isfinite(rgb).all()
    # chunking must not change values
    rgb2, _, _ = render_image(render_fn, state.params, rays, h, w, chunk=64)
    np.testing.assert_allclose(rgb, rgb2, rtol=1e-5, atol=1e-6)


def test_psnr_ssim_known_values():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    assert float(compute_ssim(jnp.asarray(img), jnp.asarray(img))) > 0.99
    noisy = np.clip(img + 0.1, 0, 1)
    m = evaluate_image(noisy, img)
    expected_psnr = float(mse_to_psnr(jnp.mean((noisy - img) ** 2)))
    np.testing.assert_allclose(m["psnr"], expected_psnr, rtol=1e-4)
    assert m["ssim"] < 1.0


def test_perceptual_distance_and_avg_error():
    """The self-contained perceptual metric (ops.perceptual): zero on
    identical images, deterministic, monotone in perturbation size — and
    evaluate_image now produces avg_error through it (the reference's
    ComputeAvgError limb, MipHelpers.cs:677-684, made live)."""
    from nerf_or_nothing_tpu.ops.perceptual import perceptual_distance

    rng = np.random.default_rng(3)
    img = rng.uniform(size=(48, 48, 3)).astype(np.float32)
    assert float(perceptual_distance(img, img)) == 0.0
    small = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1)
    big = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    d_small = float(perceptual_distance(img, small.astype(np.float32)))
    d_big = float(perceptual_distance(img, big.astype(np.float32)))
    assert 0.0 < d_small < d_big
    # determinism across calls (fixed-seed filters)
    assert d_small == float(
        perceptual_distance(img, small.astype(np.float32))
    )

    m = evaluate_image(small, img)
    assert "lpips_proxy" in m and m["lpips_proxy"] > 0
    assert "avg_error" in m and m["avg_error"] > 0
    # explicit external LPIPS still takes precedence
    m2 = evaluate_image(small, img, lpips=0.5)
    assert m2["lpips"] == 0.5 and "lpips_proxy" not in m2


def test_metrics_logger_tensorboard(tmp_path):
    """TensorBoard events are written when a SummaryWriter is importable
    (torch.utils.tensorboard in this image), alongside the CSV."""
    import jax.numpy as jnp

    from nerf_or_nothing_tpu.metrics import MetricsLogger, Stats

    log_dir = str(tmp_path / "logs")
    logger = MetricsLogger(log_dir, batch_size=4)
    z = jnp.zeros(())
    stats = Stats(loss=z, losses=jnp.zeros((2,)), weight_l2=z, psnr=z,
                  psnrs=jnp.zeros((2,)), grad_norm=z, grad_abs_max=z,
                  grad_norm_clipped=z, learning_rate=z)
    logger.log(1, stats, quiet=True)
    logger.log(2, stats, quiet=True)
    logger.close()
    assert os.path.exists(os.path.join(log_dir, "train_stats.csv"))
    try:
        import torch.utils.tensorboard  # noqa: F401
    except Exception:
        return  # CSV-only degradation is the contract without TB
    tb_files = os.listdir(os.path.join(log_dir, "tb"))
    assert any(f.startswith("events.out") for f in tb_files)
