"""Volume rendering: forward vs oracle, custom VJP vs jax.grad & oracle VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reference_oracle as oracle
from nerf_or_nothing_tpu.ops import render


@pytest.fixture
def batch():
    rng = np.random.default_rng(7)
    R, S = 6, 16
    rgb = rng.uniform(0, 1, size=(R, S, 3))
    density = rng.uniform(0, 3, size=(R, S))
    t_vals = np.sort(rng.uniform(2, 6, size=(R, S + 1)), axis=-1)
    dirs = rng.normal(size=(R, 3))
    return (
        jnp.asarray(rgb), jnp.asarray(density),
        jnp.asarray(t_vals), jnp.asarray(dirs),
    )


@pytest.mark.parametrize("white_bkgd", [True, False])
def test_forward_matches_oracle(batch, white_bkgd):
    rgb, density, t_vals, dirs = batch
    out = render.volumetric_rendering(rgb, density, t_vals, dirs, white_bkgd)
    for r in range(rgb.shape[0]):
        c_ref, dist_ref, acc_ref, _, _, w_ref = oracle.volumetric_rendering(
            np.asarray(rgb[r]), np.asarray(density[r]),
            np.asarray(t_vals[r]), np.asarray(dirs[r]), white_bkgd,
        )
        np.testing.assert_allclose(out.rgb[r], c_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(out.distance[r], dist_ref, rtol=1e-4)
        np.testing.assert_allclose(out.acc[r], acc_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(out.weights[r], w_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("white_bkgd", [True, False])
def test_composite_matches_volumetric_rendering(batch, white_bkgd):
    rgb, density, t_vals, dirs = batch
    ref = render.volumetric_rendering(rgb, density, t_vals, dirs, white_bkgd)
    comp_rgb, acc, weights = render.composite(
        rgb, density, t_vals, dirs, white_bkgd
    )
    np.testing.assert_allclose(comp_rgb, ref.rgb, rtol=1e-6)
    np.testing.assert_allclose(acc, ref.acc, rtol=1e-6)
    np.testing.assert_allclose(weights, ref.weights, rtol=1e-6)


@pytest.mark.parametrize("white_bkgd", [True, False])
def test_custom_vjp_equals_autodiff(batch, white_bkgd):
    """The hand-derived backward (MipHelpers.cs:517-610 semantics) must equal
    jax.grad of the plain composite — the reference's two-paths-one-math
    design turned into a property test (SURVEY.md §4)."""
    rgb, density, t_vals, dirs = batch

    def loss_custom(rgb, density):
        c, acc, w = render.composite(rgb, density, t_vals, dirs, white_bkgd)
        return jnp.sum(c**2) + jnp.sum(jnp.sin(acc)) + jnp.sum(w * 0.3)

    def loss_plain(rgb, density):
        out = render.volumetric_rendering(
            rgb, density, t_vals, dirs, white_bkgd
        )
        return (
            jnp.sum(out.rgb**2)
            + jnp.sum(jnp.sin(out.acc))
            + jnp.sum(out.weights * 0.3)
        )

    g_custom = jax.grad(loss_custom, argnums=(0, 1))(rgb, density)
    g_plain = jax.grad(loss_plain, argnums=(0, 1))(rgb, density)
    np.testing.assert_allclose(g_custom[0], g_plain[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g_custom[1], g_plain[1], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("white_bkgd", [True, False])
def test_custom_vjp_matches_reference_hand_derived_gradient(batch, white_bkgd):
    """dL/drgb and dL/dsigma for L = g . comp_rgb vs the scalar transcription
    of VolumetricRenderingGradient."""
    rgb, density, t_vals, dirs = batch
    g_rgb = np.asarray([0.3, -1.2, 0.7])

    def loss(rgb_, density_):
        c, _, _ = render.composite(rgb_, density_, t_vals, dirs, white_bkgd)
        return jnp.sum(c * jnp.asarray(g_rgb))

    dc, dsigma = jax.grad(loss, argnums=(0, 1))(rgb, density)

    for r in range(rgb.shape[0]):
        _, _, _, alpha, trans, weights = oracle.volumetric_rendering(
            np.asarray(rgb[r]), np.asarray(density[r]),
            np.asarray(t_vals[r]), np.asarray(dirs[r]), white_bkgd,
        )
        c_ref, s_ref = oracle.volumetric_rendering_gradient(
            g_rgb, alpha, trans, weights,
            np.asarray(rgb[r]), np.asarray(density[r]),
            np.asarray(t_vals[r]), np.asarray(dirs[r]), white_bkgd,
        )
        np.testing.assert_allclose(dc[r], c_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(dsigma[r], s_ref, rtol=1e-4, atol=1e-5)


def test_zero_density_renders_background(batch):
    rgb, density, t_vals, dirs = batch
    out = render.volumetric_rendering(
        rgb, jnp.zeros_like(density), t_vals, dirs, True
    )
    np.testing.assert_allclose(out.rgb, 1.0, atol=1e-6)  # white
    np.testing.assert_allclose(out.acc, 0.0, atol=1e-6)


def test_opaque_first_sample_dominates(batch):
    rgb, density, t_vals, dirs = batch
    density = density.at[:, 0].set(1e6)
    out = render.volumetric_rendering(rgb, density, t_vals, dirs, False)
    np.testing.assert_allclose(out.rgb, rgb[:, 0], rtol=1e-5)
    np.testing.assert_allclose(out.acc, 1.0, rtol=1e-6)
