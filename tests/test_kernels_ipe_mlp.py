"""Fused encode+MLP kernel vs the two-stage oracle (IPE then MLP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_or_nothing_tpu.config import Config
from nerf_or_nothing_tpu.kernels.fused_ipe_mlp import fused_ipe_mlp_apply
from nerf_or_nothing_tpu.models import mlp as mlp_lib
from nerf_or_nothing_tpu.ops import ipe


def small_cfg(**kw):
    base = dict(
        net_depth=4, net_width=32, net_depth_condition=1,
        net_width_condition=16, skip_layer=2, max_deg_point=4,
        compute_dtype="float32",
    )
    base.update(kw)
    return Config(**base)


def make_inputs(cfg, R=4, S=4, seed=0):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    params = mlp_lib.init_mlp(k1, cfg)
    means = jax.random.normal(k2, (R, S, 3))
    covs = jnp.abs(jax.random.normal(k3, (R, S, 3))) * 0.05
    d = jax.random.normal(k4, (R, cfg.direction_features)) * 0.5
    return params, means, covs, d


def oracle(params, cfg, means, covs, d):
    x = ipe.integrated_pos_enc((means, covs), cfg.min_deg_point,
                               cfg.max_deg_point)
    return mlp_lib.apply_mlp(params, cfg, x, d)


@pytest.mark.parametrize("tile", [8, 16])
def test_fused_ipe_forward_matches_oracle(tile):
    cfg = small_cfg()
    params, means, covs, d = make_inputs(cfg)
    rgb_ref, den_ref = oracle(params, cfg, means, covs, d)
    rgb, den = fused_ipe_mlp_apply(params, cfg, means, covs, d, tile=tile)
    np.testing.assert_allclose(rgb, rgb_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(den, den_ref, rtol=1e-4, atol=1e-5)


def test_fused_ipe_forward_min_deg_nonzero():
    cfg = small_cfg(min_deg_point=1, max_deg_point=5)
    params, means, covs, d = make_inputs(cfg, seed=1)
    rgb_ref, den_ref = oracle(params, cfg, means, covs, d)
    rgb, den = fused_ipe_mlp_apply(params, cfg, means, covs, d, tile=8)
    np.testing.assert_allclose(rgb, rgb_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(den, den_ref, rtol=1e-4, atol=1e-5)


def test_fused_ipe_param_grads_match_oracle():
    """dW/db parity across the permutation round-trip, incl. skip layers."""
    cfg = small_cfg(net_depth=5, skip_layer=2)  # skip at layers 2 and 4
    params, means, covs, d = make_inputs(cfg, R=6, S=4, seed=2)

    def loss_fused(p):
        rgb, den = fused_ipe_mlp_apply(p, cfg, means, covs, d, tile=8)
        return jnp.sum(jnp.sin(rgb)) + jnp.sum(den**2)

    def loss_ref(p):
        rgb, den = oracle(p, cfg, means, covs, d)
        return jnp.sum(jnp.sin(rgb)) + jnp.sum(den**2)

    g_f = jax.grad(loss_fused)(params)
    g_r = jax.grad(loss_ref)(params)
    for i, ((dwf, dbf), (dwr, dbr)) in enumerate(zip(g_f, g_r)):
        np.testing.assert_allclose(dwf, dwr, rtol=1e-4, atol=1e-5,
                                   err_msg=f"dW layer {i}")
        np.testing.assert_allclose(dbf, dbr, rtol=1e-4, atol=1e-5,
                                   err_msg=f"db layer {i}")


def test_fused_ipe_dir_grad_exact_means_grad_zero():
    cfg = small_cfg()
    params, means, covs, d = make_inputs(cfg, seed=3)

    def loss(fn):
        def f(means_, covs_, d_):
            rgb, den = fn(means_, covs_, d_)
            return jnp.sum(rgb**2) + jnp.sum(den)
        return f

    g_f = jax.grad(
        loss(lambda m, c, dd: fused_ipe_mlp_apply(params, cfg, m, c, dd,
                                                  tile=8)),
        argnums=(0, 1, 2),
    )(means, covs, d)
    g_r = jax.grad(
        loss(lambda m, c, dd: oracle(params, cfg, m, c, dd)),
        argnums=(0, 1, 2),
    )(means, covs, d)
    # direction grads exact; means/covs grads are zero BY DESIGN
    np.testing.assert_allclose(g_f[2], g_r[2], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g_f[0], 0.0)
    np.testing.assert_allclose(g_f[1], 0.0)


def test_fused_ipe_in_full_model():
    """use_pallas=True routes render_rays through the fused encode+MLP."""
    from nerf_or_nothing_tpu.models import mipnerf
    from nerf_or_nothing_tpu.rays import Rays

    cfg = small_cfg(num_samples=8, num_levels=2, use_pallas=True, fuse_ipe=True)
    cfg_ref = cfg.replace(use_pallas=False)
    params, _, _, _ = make_inputs(cfg)
    R = 8
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(R, 3)).astype(np.float32)
    ones = np.ones((R, 1), np.float32)
    rays = Rays(
        jnp.zeros((R, 3)), jnp.asarray(dirs),
        jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)),
        jnp.asarray(ones * 0.005), jnp.asarray(ones * 2.0),
        jnp.asarray(ones * 6.0), jnp.asarray(ones),
    )
    out_f = mipnerf.render_rays(params, cfg, jax.random.PRNGKey(0), rays,
                                randomized=False, white_bkgd=True)
    out_r = mipnerf.render_rays(params, cfg_ref, jax.random.PRNGKey(0), rays,
                                randomized=False, white_bkgd=True)
    for f, r in zip(out_f, out_r):
        np.testing.assert_allclose(f.rgb, r.rgb, rtol=1e-4, atol=1e-5)

    # gradients through the full model agree too
    from nerf_or_nothing_tpu.models.mipnerf import multiscale_loss

    pixels = jnp.asarray(rng.uniform(size=(R, 3)).astype(np.float32))

    def loss(c):
        def f(p):
            res = mipnerf.render_rays(p, c, jax.random.PRNGKey(0), rays,
                                      randomized=False, white_bkgd=True)
            return multiscale_loss(res, pixels, rays.loss_mult, c)[0]
        return f

    g_f = jax.grad(loss(cfg))(params)
    g_r = jax.grad(loss(cfg_ref))(params)
    for (dwf, _), (dwr, _) in zip(g_f, g_r):
        np.testing.assert_allclose(dwf, dwr, rtol=1e-3, atol=1e-5)
