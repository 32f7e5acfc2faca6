"""Fused Pallas MLP vs the pure-JAX oracle (forward + jax.grad parity).

These tests pin the kernel MATH with tiny tiles (8-16 rows) in Pallas
interpret mode; real TPU hardware cannot lower such block shapes (lane
dim must be 128-divisible or whole-array), so under
``NON_TPU_TEST_PLATFORM=tpu`` they skip and the compiled-Mosaic numerics
gate is ``tests/test_tpu_parity.py`` (flagship shapes) instead.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_or_nothing_tpu.config import Config
from nerf_or_nothing_tpu.kernels.fused_mlp import fused_mlp_apply
from nerf_or_nothing_tpu.models import mlp as mlp_lib

pytestmark = pytest.mark.skipif(
    jax.default_backend() in ("tpu", "axon"),
    reason="tiny-tile blocks lower only in interpret mode; hardware "
    "parity is tests/test_tpu_parity.py",
)


def small_cfg(**kw):
    base = dict(
        net_depth=3, net_width=32, net_depth_condition=1,
        net_width_condition=16, skip_layer=2, max_deg_point=4,
        compute_dtype="float32",
    )
    base.update(kw)
    return Config(**base)


def make_inputs(cfg, R=4, S=6, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    params = mlp_lib.init_mlp(k1, cfg)
    x = jax.random.normal(k2, (R, S, cfg.location_features)) * 0.5
    d = jax.random.normal(k3, (R, cfg.direction_features)) * 0.5
    return params, x, d


@pytest.mark.parametrize("tile", [8, 16])
def test_fused_forward_matches_oracle(tile):
    cfg = small_cfg()
    params, x, d = make_inputs(cfg)
    rgb_ref, den_ref = mlp_lib.apply_mlp(params, cfg, x, d)
    rgb, den = fused_mlp_apply(params, cfg, x, d, tile=tile)
    np.testing.assert_allclose(rgb, rgb_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(den, den_ref, rtol=1e-4, atol=1e-5)


def test_fused_forward_with_skip_inside_depth():
    """Skip layer genuinely active (net_depth > skip_layer)."""
    cfg = small_cfg(net_depth=5, skip_layer=2)  # skips at layers 2 and 4
    params, x, d = make_inputs(cfg, R=3, S=5, seed=1)
    rgb_ref, den_ref = mlp_lib.apply_mlp(params, cfg, x, d)
    rgb, den = fused_mlp_apply(params, cfg, x, d, tile=8)
    np.testing.assert_allclose(rgb, rgb_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(den, den_ref, rtol=1e-4, atol=1e-5)


def test_fused_forward_ragged_rows():
    """Row count not a multiple of the tile: padding must not leak."""
    cfg = small_cfg()
    params, x, d = make_inputs(cfg, R=3, S=7)  # 21 rows, tile 16
    rgb_ref, den_ref = mlp_lib.apply_mlp(params, cfg, x, d)
    rgb, den = fused_mlp_apply(params, cfg, x, d, tile=16)
    np.testing.assert_allclose(rgb, rgb_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(den, den_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("tile", [8, 16])
def test_fused_grads_match_oracle(tile):
    """Full jax.grad parity: dW, db for every layer, and input grads."""
    cfg = small_cfg(net_depth=4, skip_layer=2)
    params, x, d = make_inputs(cfg, R=4, S=4, seed=2)

    def loss_fused(params, x, d):
        rgb, den = fused_mlp_apply(params, cfg, x, d, tile=tile)
        return jnp.sum(jnp.sin(rgb)) + jnp.sum(den**2)

    def loss_ref(params, x, d):
        rgb, den = mlp_lib.apply_mlp(params, cfg, x, d)
        return jnp.sum(jnp.sin(rgb)) + jnp.sum(den**2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(params, x, d)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, x, d)

    for i, ((dw_f, db_f), (dw_r, db_r)) in enumerate(
        zip(g_fused[0], g_ref[0])
    ):
        np.testing.assert_allclose(
            dw_f, dw_r, rtol=1e-4, atol=1e-5, err_msg=f"dW layer {i}"
        )
        np.testing.assert_allclose(
            db_f, db_r, rtol=1e-4, atol=1e-5, err_msg=f"db layer {i}"
        )
    np.testing.assert_allclose(g_fused[1], g_ref[1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g_fused[2], g_ref[2], rtol=1e-4, atol=1e-5)


def test_fused_grads_accumulate_across_tiles():
    """More rows than one tile: dW accumulation across grid steps must sum
    exactly (deterministic, unlike the reference's atomicAdd backward)."""
    cfg = small_cfg()
    params, x, d = make_inputs(cfg, R=8, S=8, seed=3)  # 64 rows, tile 16

    def loss(apply):
        def f(params):
            rgb, den = apply(params, cfg, x, d)
            return jnp.sum(rgb * rgb) + jnp.sum(jnp.abs(den))
        return f

    g_fused = jax.grad(loss(lambda p, c, xx, dd: fused_mlp_apply(
        p, c, xx, dd, tile=16)))(params)
    g_ref = jax.grad(loss(mlp_lib.apply_mlp))(params)
    for i, ((dw_f, _), (dw_r, _)) in enumerate(zip(g_fused, g_ref)):
        np.testing.assert_allclose(
            dw_f, dw_r, rtol=1e-4, atol=1e-5, err_msg=f"layer {i}"
        )


def test_fused_in_full_model():
    """fused kernel plugged into render_rays + train loss end-to-end."""
    from nerf_or_nothing_tpu.models import mipnerf
    from nerf_or_nothing_tpu.rays import Rays

    cfg = small_cfg(num_samples=8, num_levels=2)
    params, _, _ = make_inputs(cfg)
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

    def apply_fused(p, c, x, dd):
        return fused_mlp_apply(p, c, x, dd, tile=16)

    out_f = mipnerf.render_rays(
        params, cfg, jax.random.PRNGKey(0), rays, randomized=False,
        white_bkgd=True, mlp_apply=apply_fused,
    )
    out_r = mipnerf.render_rays(
        params, cfg, jax.random.PRNGKey(0), rays, randomized=False,
        white_bkgd=True,
    )
    for f, r in zip(out_f, out_r):
        np.testing.assert_allclose(f.rgb, r.rgb, rtol=1e-4, atol=1e-5)


def test_per_ray_and_broadcast_paths_agree():
    """tile % S == 0 triggers the per-ray-direction kernel path; a tile
    that straddles rays falls back to pre-broadcast. Both must agree."""
    cfg = small_cfg(net_depth=4, skip_layer=2)
    params, x, d = make_inputs(cfg, R=6, S=4, seed=5)  # 24 rows

    def run(tile):
        def loss(p):
            rgb, den = fused_mlp_apply(p, cfg, x, d, tile=tile)
            return jnp.sum(rgb * rgb) + jnp.sum(den)
        g = jax.grad(loss)(params)
        rgb, den = fused_mlp_apply(params, cfg, x, d, tile=tile)
        return rgb, den, g

    rgb_a, den_a, g_a = run(8)   # 8 % 4 == 0 -> per-ray path
    rgb_b, den_b, g_b = run(6)   # 6 % 4 != 0 -> broadcast fallback
    np.testing.assert_allclose(rgb_a, rgb_b, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(den_a, den_b, rtol=1e-4, atol=1e-5)
    for (dwa, dba), (dwb, dbb) in zip(g_a, g_b):
        np.testing.assert_allclose(dwa, dwb, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(dba, dbb, rtol=1e-4, atol=1e-5)


def test_fused_transposed_heads_matches_oracle():
    """fm_heads=t (narrow heads as transposed matmuls + VPU outer-product
    chain) must be numerically identical to the default path: forward AND
    every gradient."""
    cfg = small_cfg(net_depth=4, skip_layer=2,
                    kernel_probes="fm_heads=t")
    params, x, d = make_inputs(cfg, R=4, S=4, seed=3)

    def loss(c):
        def f(params, x, d):
            rgb, den = fused_mlp_apply(params, cfg.replace(kernel_probes=c),
                                       x, d, tile=8)
            return jnp.sum(jnp.sin(rgb)) + jnp.sum(den**2)
        return f

    rgb_t, den_t = fused_mlp_apply(params, cfg, x, d, tile=8)
    rgb_0, den_0 = fused_mlp_apply(
        params, cfg.replace(kernel_probes=""), x, d, tile=8
    )
    np.testing.assert_allclose(rgb_t, rgb_0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(den_t, den_0, rtol=1e-4, atol=1e-5)

    g_t = jax.grad(loss("fm_heads=t"), argnums=(0, 1, 2))(params, x, d)
    g_0 = jax.grad(loss(""), argnums=(0, 1, 2))(params, x, d)
    for i, ((dw_f, db_f), (dw_r, db_r)) in enumerate(zip(g_t[0], g_0[0])):
        np.testing.assert_allclose(
            dw_f, dw_r, rtol=1e-4, atol=1e-5, err_msg=f"dW layer {i}"
        )
        np.testing.assert_allclose(
            db_f, db_r, rtol=1e-4, atol=1e-5, err_msg=f"db layer {i}"
        )
    np.testing.assert_allclose(g_t[1], g_0[1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g_t[2], g_0[2], rtol=1e-4, atol=1e-5)
