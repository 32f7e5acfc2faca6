"""Whole-level fused train kernel vs autodiff of the unfused oracle.

These tests pin the kernel MATH with tiny tiles (8-32 rows) in Pallas
interpret mode; real TPU hardware cannot lower such block shapes (lane
dim must be 128-divisible or whole-array), so under
``NON_TPU_TEST_PLATFORM=tpu`` they skip and the compiled-Mosaic numerics
gate is ``tests/test_tpu_parity.py`` (flagship shapes) instead.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_or_nothing_tpu.config import Config, tiny_config
from nerf_or_nothing_tpu.kernels.fused_level import fused_level_train
from nerf_or_nothing_tpu.models import mlp as mlp_lib
from nerf_or_nothing_tpu.ops import render
from nerf_or_nothing_tpu.rays import Rays
from nerf_or_nothing_tpu.train import (
    init_train_state,
    make_jitted_train_step,
)

pytestmark = pytest.mark.skipif(
    jax.default_backend() in ("tpu", "axon"),
    reason="tiny-tile blocks lower only in interpret mode; hardware "
    "parity is tests/test_tpu_parity.py",
)


def small_cfg(**kw):
    base = dict(
        net_depth=3, net_width=32, net_depth_condition=1,
        net_width_condition=16, skip_layer=2, max_deg_point=4,
        compute_dtype="float32", num_samples=8,
    )
    base.update(kw)
    return Config(**base)


def make_level_inputs(cfg, R=6, seed=0):
    S = cfg.num_samples
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    params = mlp_lib.init_mlp(ks[0], cfg)
    x_enc = jax.random.normal(ks[1], (R, S, cfg.location_features)) * 0.5
    dir_enc = jax.random.normal(ks[2], (R, cfg.direction_features)) * 0.5
    t_vals = jnp.sort(
        jax.random.uniform(ks[3], (R, S + 1), minval=2.0, maxval=6.0), axis=-1
    )
    dirs = jax.random.normal(ks[4], (R, 3))
    pixels = jax.random.uniform(ks[5], (R, 3))
    return params, x_enc, dir_enc, t_vals, dirs, pixels


def oracle_level(params, cfg, x_enc, dir_enc, t_vals, dirs, pixels, mask,
                 level_weight, white_bkgd):
    """Unfused level loss: MLP -> activations -> composite -> masked MSE."""
    raw_rgb, raw_den = mlp_lib.apply_mlp(params, cfg, x_enc, dir_enc)
    rgb = jax.nn.sigmoid(raw_rgb)
    rgb = rgb * (1.0 + 2.0 * cfg.rgb_padding) - cfg.rgb_padding
    density = jax.nn.softplus(raw_den[..., 0] + cfg.density_bias)
    comp, acc, weights = render.composite(
        rgb, density, t_vals, dirs, white_bkgd
    )
    denom = jnp.maximum(jnp.sum(mask), 1e-10)
    sq = jnp.sum((comp - pixels) ** 2, axis=-1)
    return level_weight * jnp.sum(mask * sq) / denom, (comp, acc, weights)


@pytest.mark.parametrize("white_bkgd", [True, False])
def test_fused_level_matches_autodiff(white_bkgd):
    """dW/db from the fused kernel == jax.grad of the unfused oracle, and
    the forward outputs (comp/acc/weights) match the oracle composite."""
    cfg = small_cfg()
    params, x_enc, dir_enc, t_vals, dirs, pixels = make_level_inputs(cfg)
    R = pixels.shape[0]
    mask = jnp.ones((R,))
    level_weight = 0.1
    denom = jnp.maximum(jnp.sum(mask), 1e-10)
    g_scale = (level_weight * 2.0 * mask / denom)[..., None]

    comp, acc, weights, d_params = fused_level_train(
        params, cfg, x_enc, dir_enc, t_vals, dirs, pixels, g_scale,
        white_bkgd, tile=16,
    )

    grads_ref, (comp_ref, acc_ref, w_ref) = jax.grad(
        lambda p: oracle_level(p, cfg, x_enc, dir_enc, t_vals, dirs,
                               pixels, mask, level_weight, white_bkgd),
        has_aux=True,
    )(params)

    np.testing.assert_allclose(comp, comp_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(acc, acc_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(weights, w_ref, rtol=1e-4, atol=1e-5)
    for i, ((dw, db), (dw_r, db_r)) in enumerate(zip(d_params, grads_ref)):
        np.testing.assert_allclose(
            dw, dw_r, rtol=2e-4, atol=1e-6, err_msg=f"dW layer {i}"
        )
        np.testing.assert_allclose(
            db, db_r, rtol=2e-4, atol=1e-6, err_msg=f"db layer {i}"
        )


def test_fused_level_rows_composite_matches_autodiff():
    """The ROW-MAJOR composite + untransposed head backward (fl_comp=rows)
    is the real-hardware fallback for num_samples != 128 — but interpret
    mode always takes the channel-plane path by default, so this probe-
    forced run keeps the rows path under oracle coverage off-TPU
    (on-TPU coverage: test_tpu_parity.py non-128-samples test)."""
    cfg = small_cfg(kernel_probes="fl_comp=rows")
    params, x_enc, dir_enc, t_vals, dirs, pixels = make_level_inputs(cfg)
    R = pixels.shape[0]
    mask = jnp.ones((R,))
    level_weight = 0.1
    denom = jnp.maximum(jnp.sum(mask), 1e-10)
    g_scale = (level_weight * 2.0 * mask / denom)[..., None]

    comp, acc, weights, d_params = fused_level_train(
        params, cfg, x_enc, dir_enc, t_vals, dirs, pixels, g_scale,
        True, tile=16,
    )
    grads_ref, (comp_ref, acc_ref, w_ref) = jax.grad(
        lambda p: oracle_level(p, cfg, x_enc, dir_enc, t_vals, dirs,
                               pixels, mask, level_weight, True),
        has_aux=True,
    )(params)
    np.testing.assert_allclose(comp, comp_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(acc, acc_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(weights, w_ref, rtol=1e-4, atol=1e-5)
    for i, ((dw, db), (dw_r, db_r)) in enumerate(zip(d_params, grads_ref)):
        np.testing.assert_allclose(
            dw, dw_r, rtol=2e-4, atol=1e-6, err_msg=f"dW layer {i}"
        )
        np.testing.assert_allclose(
            db, db_r, rtol=2e-4, atol=1e-6, err_msg=f"db layer {i}"
        )


def test_fused_level_masked_loss_and_padding():
    """Non-uniform loss_mult mask + row count not a multiple of the tile:
    padded rays must contribute nothing."""
    cfg = small_cfg()
    params, x_enc, dir_enc, t_vals, dirs, pixels = make_level_inputs(
        cfg, R=5, seed=3
    )
    mask = jnp.asarray([1.0, 4.0, 0.0, 2.0, 1.0])
    denom = jnp.maximum(jnp.sum(mask), 1e-10)
    g_scale = (2.0 * mask / denom)[..., None]

    comp, acc, weights, d_params = fused_level_train(
        params, cfg, x_enc, dir_enc, t_vals, dirs, pixels, g_scale,
        True, tile=16,  # 5 rays * 8 samples = 40 rows -> padded to 48
    )
    grads_ref, (comp_ref, _, _) = jax.grad(
        lambda p: oracle_level(p, cfg, x_enc, dir_enc, t_vals, dirs,
                               pixels, mask, 1.0, True),
        has_aux=True,
    )(params)
    np.testing.assert_allclose(comp, comp_ref, rtol=1e-4, atol=1e-5)
    for i, ((dw, db), (dw_r, db_r)) in enumerate(zip(d_params, grads_ref)):
        np.testing.assert_allclose(
            dw, dw_r, rtol=2e-4, atol=1e-6, err_msg=f"dW layer {i}"
        )
        np.testing.assert_allclose(
            db, db_r, rtol=2e-4, atol=1e-6, err_msg=f"db layer {i}"
        )


def make_rays(R, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((R, 1), np.float32)
    return (
        Rays(
            jnp.zeros((R, 3)), jnp.asarray(d), jnp.asarray(vd),
            jnp.asarray(ones * 0.005), jnp.asarray(ones * 2.0),
            jnp.asarray(ones * 6.0), jnp.asarray(ones),
        ),
        jnp.asarray(rng.uniform(size=(R, 3)).astype(np.float32)),
    )


def test_fused_level_train_step_matches_unfused():
    """Full train step: fuse_level=True == fuse_level=False (the per-kernel
    Pallas path) == plain XLA, at identical f32 precision."""
    base = tiny_config(
        batch_size=16, num_samples=8, num_levels=2, net_depth=3,
        net_width=32, net_width_condition=16, skip_layer=2, max_deg_point=4,
        randomized=False, donate_params=False, compute_dtype="float32",
        use_pallas=True,
    )
    rays, pixels = make_rays(base.batch_size)

    results = {}
    for name, cfg in (
        ("fused_level", base),
        ("per_kernel", base.replace(fuse_level=False)),
        ("xla", base.replace(use_pallas=False)),
    ):
        state = init_train_state(cfg)
        step = make_jitted_train_step(cfg)
        for _ in range(2):
            state, stats = step(state, rays, pixels)
        results[name] = (state, stats)

    for other in ("per_kernel", "xla"):
        s_f, st_f = results["fused_level"]
        s_o, st_o = results[other]
        np.testing.assert_allclose(
            float(st_f.loss), float(st_o.loss), rtol=1e-5, err_msg=other
        )
        np.testing.assert_allclose(
            float(st_f.grad_norm), float(st_o.grad_norm), rtol=1e-4,
            err_msg=other,
        )
        for (w1, b1), (w2, b2) in zip(s_f.params, s_o.params):
            np.testing.assert_allclose(
                np.asarray(w1), np.asarray(w2), rtol=1e-4, atol=1e-6,
                err_msg=other,
            )
            np.testing.assert_allclose(
                np.asarray(b1), np.asarray(b2), rtol=1e-4, atol=1e-6,
                err_msg=other,
            )


def test_fused_level_render_matches_oracle():
    """The forward-only render kernel (fused_level_render) == the unfused
    MLP + composite oracle, including the masked/padded tile tail."""
    from nerf_or_nothing_tpu.kernels.fused_level import fused_level_render

    cfg = small_cfg()
    params, x_enc, dir_enc, t_vals, dirs, _ = make_level_inputs(
        cfg, R=5, seed=7
    )
    for white_bkgd in (True, False):
        comp, acc, weights = fused_level_render(
            params, cfg, x_enc, dir_enc, t_vals, dirs, white_bkgd, tile=16,
        )
        raw_rgb, raw_den = mlp_lib.apply_mlp(params, cfg, x_enc, dir_enc)
        rgb = jax.nn.sigmoid(raw_rgb)
        rgb = rgb * (1.0 + 2.0 * cfg.rgb_padding) - cfg.rgb_padding
        density = jax.nn.softplus(raw_den[..., 0] + cfg.density_bias)
        comp_ref, acc_ref, w_ref = render.composite(
            rgb, density, t_vals, dirs, white_bkgd
        )
        np.testing.assert_allclose(comp, comp_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(acc, acc_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(weights, w_ref, rtol=1e-4, atol=1e-5)


def test_inference_render_path_matches_training_forward():
    """make_render_fn(inference fused-render path) == the plain-XLA render
    on the same params: the eval kernel is numerically the same model."""
    from nerf_or_nothing_tpu.eval import make_render_fn

    cfg = tiny_config(
        batch_size=16, num_samples=8, num_levels=2, net_depth=3,
        net_width=32, net_width_condition=16, skip_layer=2, max_deg_point=4,
        randomized=False, donate_params=False, compute_dtype="float32",
        use_pallas=True,
    )
    rays, _ = make_rays(cfg.batch_size)
    params = init_train_state(cfg).params
    key = jax.random.PRNGKey(0)

    rgb_f, dist_f, acc_f = make_render_fn(cfg)(params, key, rays)
    rgb_o, dist_o, acc_o = make_render_fn(cfg.replace(use_pallas=False))(
        params, key, rays
    )
    np.testing.assert_allclose(rgb_f, rgb_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dist_f, dist_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(acc_f, acc_o, rtol=1e-4, atol=1e-5)


def test_fused_level_in_kernel_ipe_matches_autodiff():
    """fuse_ipe mode: the kernel takes (means, covs) and runs the IPE
    internally — gradients must match jax.grad of the oracle that encodes
    with ops.ipe.integrated_pos_enc (same math, interleaved layout)."""
    from nerf_or_nothing_tpu.ops import ipe as ipe_lib

    cfg = small_cfg()
    R, S = 6, cfg.num_samples
    ks = jax.random.split(jax.random.PRNGKey(11), 6)
    params = mlp_lib.init_mlp(ks[0], cfg)
    means = jax.random.normal(ks[1], (R, S, 3)) * 0.5
    covs = jax.random.uniform(ks[2], (R, S, 3)) * 0.1
    dir_enc = jax.random.normal(ks[3], (R, cfg.direction_features)) * 0.5
    t_vals = jnp.sort(
        jax.random.uniform(ks[4], (R, S + 1), minval=2.0, maxval=6.0),
        axis=-1,
    )
    dirs = jax.random.normal(ks[5], (R, 3))
    pixels = jax.random.uniform(ks[0], (R, 3))
    mask = jnp.ones((R,))
    g_scale = (2.0 * mask / R)[..., None]

    comp, acc, weights, d_params = fused_level_train(
        params, cfg, None, dir_enc, t_vals, dirs, pixels, g_scale,
        True, tile=16, means_covs=(means, covs),
    )

    def oracle(p):
        x_enc = ipe_lib.integrated_pos_enc(
            (means, covs), cfg.min_deg_point, cfg.max_deg_point
        )
        return oracle_level(p, cfg, x_enc, dir_enc, t_vals, dirs, pixels,
                            mask, 1.0, True)

    grads_ref, (comp_ref, acc_ref, w_ref) = jax.grad(
        oracle, has_aux=True
    )(params)
    np.testing.assert_allclose(comp, comp_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(acc, acc_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(weights, w_ref, rtol=1e-4, atol=1e-5)
    for i, ((dw, db), (dw_r, db_r)) in enumerate(zip(d_params, grads_ref)):
        np.testing.assert_allclose(
            dw, dw_r, rtol=2e-4, atol=1e-6, err_msg=f"dW layer {i}"
        )
        np.testing.assert_allclose(
            db, db_r, rtol=2e-4, atol=1e-6, err_msg=f"db layer {i}"
        )


def test_fused_level_in_kernel_fast_ipe_matches_autodiff():
    """fuse_ipe + fast_ipe: the kernel's polynomial transcendentals must
    reproduce jax.grad of an oracle that encodes with the SAME fast path
    (fast-vs-exact encode accuracy is pinned separately in
    test_ops_ipe.test_integrated_pos_enc_fast_matches_exact)."""
    from nerf_or_nothing_tpu.ops import ipe as ipe_lib

    cfg = small_cfg(fuse_ipe=True, fast_ipe=True)
    R, S = 6, cfg.num_samples
    ks = jax.random.split(jax.random.PRNGKey(11), 6)
    params = mlp_lib.init_mlp(ks[0], cfg)
    means = jax.random.normal(ks[1], (R, S, 3)) * 0.5
    covs = jax.random.uniform(ks[2], (R, S, 3)) * 0.1
    dir_enc = jax.random.normal(ks[3], (R, cfg.direction_features)) * 0.5
    t_vals = jnp.sort(
        jax.random.uniform(ks[4], (R, S + 1), minval=2.0, maxval=6.0),
        axis=-1,
    )
    dirs = jax.random.normal(ks[5], (R, 3))
    pixels = jax.random.uniform(ks[0], (R, 3))
    mask = jnp.ones((R,))
    g_scale = (2.0 * mask / R)[..., None]
    comp, acc, weights, d_params = fused_level_train(
        params, cfg, None, dir_enc, t_vals, dirs, pixels, g_scale,
        True, tile=16, means_covs=(means, covs),
    )

    def oracle(p):
        x_enc = ipe_lib.integrated_pos_enc(
            (means, covs), cfg.min_deg_point, cfg.max_deg_point, fast=True
        )
        return oracle_level(p, cfg, x_enc, dir_enc, t_vals, dirs, pixels,
                            mask, 1.0, True)

    grads_ref, (comp_ref, acc_ref, w_ref) = jax.grad(
        oracle, has_aux=True
    )(params)
    np.testing.assert_allclose(comp, comp_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(weights, w_ref, rtol=1e-4, atol=1e-5)
    for i, ((dw, db), (dw_r, db_r)) in enumerate(zip(d_params, grads_ref)):
        np.testing.assert_allclose(
            dw, dw_r, rtol=2e-4, atol=1e-6, err_msg=f"dW layer {i}"
        )
        np.testing.assert_allclose(
            db, db_r, rtol=2e-4, atol=1e-6, err_msg=f"db layer {i}"
        )


def test_fused_level_pair_ipe_matches_autodiff():
    """pair mode: the kernel consumes XLA-encoded transposed sin/cos
    halves (integrated_pos_enc_split) with permuted weights — gradients
    must match jax.grad of the oracle on the interleaved encode (same
    transcendentals, only the layout differs)."""
    from nerf_or_nothing_tpu.ops import ipe as ipe_lib

    cfg = small_cfg(pair_ipe=True)
    R, S = 6, cfg.num_samples
    ks = jax.random.split(jax.random.PRNGKey(13), 6)
    params = mlp_lib.init_mlp(ks[0], cfg)
    means = jax.random.normal(ks[1], (R, S, 3)) * 0.5
    covs = jax.random.uniform(ks[2], (R, S, 3)) * 0.1
    dir_enc = jax.random.normal(ks[3], (R, cfg.direction_features)) * 0.5
    t_vals = jnp.sort(
        jax.random.uniform(ks[4], (R, S + 1), minval=2.0, maxval=6.0),
        axis=-1,
    )
    dirs = jax.random.normal(ks[5], (R, 3))
    pixels = jax.random.uniform(ks[0], (R, 3))
    mask = jnp.ones((R,))
    g_scale = (2.0 * mask / R)[..., None]

    pair = ipe_lib.integrated_pos_enc_split(
        (means, covs), cfg.min_deg_point, cfg.max_deg_point
    )
    comp, acc, weights, d_params = fused_level_train(
        params, cfg, pair, dir_enc, t_vals, dirs, pixels, g_scale,
        True, tile=16,
    )

    def oracle(p):
        x_enc = ipe_lib.integrated_pos_enc(
            (means, covs), cfg.min_deg_point, cfg.max_deg_point
        )
        return oracle_level(p, cfg, x_enc, dir_enc, t_vals, dirs, pixels,
                            mask, 1.0, True)

    grads_ref, (comp_ref, acc_ref, w_ref) = jax.grad(
        oracle, has_aux=True
    )(params)
    np.testing.assert_allclose(comp, comp_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(acc, acc_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(weights, w_ref, rtol=1e-4, atol=1e-5)
    for i, ((dw, db), (dw_r, db_r)) in enumerate(zip(d_params, grads_ref)):
        np.testing.assert_allclose(
            dw, dw_r, rtol=2e-4, atol=1e-6, err_msg=f"dW layer {i}"
        )
        np.testing.assert_allclose(
            db, db_r, rtol=2e-4, atol=1e-6, err_msg=f"db layer {i}"
        )


def test_pair_ipe_train_step_matches_unfused():
    """Full train step with pair_ipe=True == the plain XLA step (f32)."""
    base = tiny_config(
        batch_size=16, num_samples=8, num_levels=2, net_depth=3,
        net_width=32, net_width_condition=16, skip_layer=2, max_deg_point=4,
        randomized=False, donate_params=False, compute_dtype="float32",
        use_pallas=True, pair_ipe=True,
    )
    rays, pixels = make_rays(base.batch_size)
    results = {}
    for name, cfg in (("pair", base),
                      ("xla", base.replace(use_pallas=False,
                                           pair_ipe=False))):
        state = init_train_state(cfg)
        step = make_jitted_train_step(cfg)
        for _ in range(2):
            state, stats = step(state, rays, pixels)
        results[name] = (state, stats)
    s_p, st_p = results["pair"]
    s_x, st_x = results["xla"]
    np.testing.assert_allclose(st_p.loss, st_x.loss, rtol=1e-5, atol=1e-6)
    for (wp, bp), (wx, bx) in zip(s_p.params, s_x.params):
        np.testing.assert_allclose(wp, wx, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(bp, bx, rtol=1e-4, atol=1e-5)


def test_xt_ipe_train_step_matches_unfused():
    """Full train step with xt_ipe=True (one-fusion transposed encode)
    == the plain XLA step (f32)."""
    base = tiny_config(
        batch_size=16, num_samples=8, num_levels=2, net_depth=3,
        net_width=32, net_width_condition=16, skip_layer=2, max_deg_point=4,
        randomized=False, donate_params=False, compute_dtype="float32",
        use_pallas=True, xt_ipe=True,
    )
    rays, pixels = make_rays(base.batch_size)
    results = {}
    for name, cfg in (("xt", base),
                      ("xla", base.replace(use_pallas=False,
                                           xt_ipe=False))):
        state = init_train_state(cfg)
        step = make_jitted_train_step(cfg)
        for _ in range(2):
            state, stats = step(state, rays, pixels)
        results[name] = (state, stats)
    s_p, st_p = results["xt"]
    s_x, st_x = results["xla"]
    np.testing.assert_allclose(st_p.loss, st_x.loss, rtol=1e-5, atol=1e-6)
    for (wp, bp), (wx, bx) in zip(s_p.params, s_x.params):
        np.testing.assert_allclose(wp, wx, rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(bp, bx, rtol=1e-4, atol=2e-5)


def test_fuse_ipe_train_step_matches_unfused():
    """Full train step with fuse_ipe=True == the plain XLA step (f32)."""
    base = tiny_config(
        batch_size=16, num_samples=8, num_levels=2, net_depth=3,
        net_width=32, net_width_condition=16, skip_layer=2, max_deg_point=4,
        randomized=False, donate_params=False, compute_dtype="float32",
        use_pallas=True, fuse_ipe=True,
    )
    rays, pixels = make_rays(base.batch_size)
    results = {}
    for name, cfg in (("fuse_ipe", base),
                      ("xla", base.replace(use_pallas=False, fuse_ipe=False))):
        state = init_train_state(cfg)
        step = make_jitted_train_step(cfg)
        for _ in range(2):
            state, stats = step(state, rays, pixels)
        results[name] = (state, stats)
    s_f, st_f = results["fuse_ipe"]
    s_o, st_o = results["xla"]
    np.testing.assert_allclose(float(st_f.loss), float(st_o.loss), rtol=1e-5)
    for (w1, b1), (w2, b2) in zip(s_f.params, s_o.params):
        np.testing.assert_allclose(
            np.asarray(w1), np.asarray(w2), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(b1), np.asarray(b2), rtol=1e-4, atol=1e-6
        )


def test_fuse_ipe_render_matches_oracle():
    """fused_level_render with in-kernel IPE == unfused render."""
    from nerf_or_nothing_tpu.eval import make_render_fn

    cfg = tiny_config(
        batch_size=16, num_samples=8, num_levels=2, net_depth=3,
        net_width=32, net_width_condition=16, skip_layer=2, max_deg_point=4,
        randomized=False, donate_params=False, compute_dtype="float32",
        use_pallas=True, fuse_ipe=True,
    )
    rays, _ = make_rays(cfg.batch_size, seed=2)
    params = init_train_state(cfg).params
    key = jax.random.PRNGKey(0)
    rgb_f, dist_f, acc_f = make_render_fn(cfg)(params, key, rays)
    rgb_o, dist_o, acc_o = make_render_fn(
        cfg.replace(use_pallas=False, fuse_ipe=False)
    )(params, key, rays)
    np.testing.assert_allclose(rgb_f, rgb_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(acc_f, acc_o, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("white_bkgd", [True, False])
def test_fused_level_twopass_matches_autodiff(white_bkgd):
    """The two-pass backward (fl_variant=twopass: chain phase + whole-tile
    dW phase over a (tile, 2) grid) must produce the same gradients and
    forward outputs as jax.grad of the unfused oracle."""
    cfg = small_cfg(kernel_probes="fl_variant=twopass")
    params, x_enc, dir_enc, t_vals, dirs, pixels = make_level_inputs(cfg)
    R = pixels.shape[0]
    mask = jnp.ones((R,))
    level_weight = 0.1
    denom = jnp.maximum(jnp.sum(mask), 1e-10)
    g_scale = (level_weight * 2.0 * mask / denom)[..., None]

    comp, acc, weights, d_params = fused_level_train(
        params, cfg, x_enc, dir_enc, t_vals, dirs, pixels, g_scale,
        white_bkgd, tile=16,
    )

    grads_ref, (comp_ref, acc_ref, w_ref) = jax.grad(
        lambda p: oracle_level(p, cfg, x_enc, dir_enc, t_vals, dirs,
                               pixels, mask, level_weight, white_bkgd),
        has_aux=True,
    )(params)

    np.testing.assert_allclose(comp, comp_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(acc, acc_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(weights, w_ref, rtol=1e-4, atol=1e-5)
    for i, ((dw, db), (dw_r, db_r)) in enumerate(zip(d_params, grads_ref)):
        np.testing.assert_allclose(
            dw, dw_r, rtol=2e-4, atol=1e-6, err_msg=f"dW layer {i}"
        )
        np.testing.assert_allclose(
            db, db_r, rtol=2e-4, atol=1e-6, err_msg=f"db layer {i}"
        )


def test_fused_level_twopass_deeper_model():
    """Two-pass with a deeper trunk (two active skip layers) + ragged rows
    (padding must contribute nothing to the scratch-accumulated dW)."""
    cfg = small_cfg(net_depth=5, skip_layer=2,
                    kernel_probes="fl_variant=twopass")
    params, x_enc, dir_enc, t_vals, dirs, pixels = make_level_inputs(
        cfg, R=7, seed=3
    )
    mask = jnp.ones((7,))
    g_scale = (2.0 * mask / jnp.sum(mask))[..., None]
    comp, acc, weights, d_params = fused_level_train(
        params, cfg, x_enc, dir_enc, t_vals, dirs, pixels, g_scale,
        True, tile=32,
    )
    grads_ref, (comp_ref, _, _) = jax.grad(
        lambda p: oracle_level(p, cfg, x_enc, dir_enc, t_vals, dirs,
                               pixels, mask, 1.0, True),
        has_aux=True,
    )(params)
    np.testing.assert_allclose(comp, comp_ref, rtol=1e-4, atol=1e-5)
    for i, ((dw, db), (dw_r, db_r)) in enumerate(zip(d_params, grads_ref)):
        np.testing.assert_allclose(
            dw, dw_r, rtol=2e-4, atol=1e-6, err_msg=f"dW layer {i}"
        )
        np.testing.assert_allclose(
            db, db_r, rtol=2e-4, atol=1e-6, err_msg=f"db layer {i}"
        )
