"""Unit tests: IPE / cone-casting ops vs the scalar reference oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reference_oracle as oracle
from nerf_or_nothing_tpu.config import RayShape
from nerf_or_nothing_tpu.ops import ipe


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_expected_sin_matches_oracle(rng):
    x = rng.normal(size=(64,)) * 3
    v = rng.uniform(0, 2, size=(64,))
    y, y_var = ipe.expected_sin(jnp.asarray(x), jnp.asarray(v))
    y_ref, y_var_ref = oracle.expected_sin(x, v)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(y_var, y_var_ref, rtol=1e-4, atol=1e-5)


def test_expected_sin_zero_var_is_sin():
    x = jnp.linspace(-3, 3, 16)
    y, y_var = ipe.expected_sin(x, jnp.zeros_like(x))
    np.testing.assert_allclose(y, np.sin(x), rtol=1e-6)
    np.testing.assert_allclose(y_var, 0.0, atol=1e-6)


@pytest.mark.parametrize("diag", [True, False])
def test_lift_gaussian_matches_oracle(rng, diag):
    d = rng.normal(size=(8, 3))
    t_mean = rng.uniform(1, 5, size=(8, 4))
    t_var = rng.uniform(0, 0.5, size=(8, 4))
    r_var = rng.uniform(0, 0.1, size=(8, 4))
    mean, cov = ipe.lift_gaussian(
        jnp.asarray(d), jnp.asarray(t_mean), jnp.asarray(t_var),
        jnp.asarray(r_var), diag=diag,
    )
    for r in range(8):
        for s in range(4):
            m_ref, c_ref = oracle.lift_gaussian(
                d[r], t_mean[r, s], t_var[r, s], r_var[r, s], diag=diag
            )
            np.testing.assert_allclose(mean[r, s], m_ref, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(cov[r, s], c_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("shape", ["cone", "cylinder"])
def test_cast_rays_matches_oracle(rng, shape):
    R, S = 4, 8
    t_vals = np.sort(rng.uniform(2, 6, size=(R, S + 1)), axis=-1)
    origins = rng.normal(size=(R, 3))
    directions = rng.normal(size=(R, 3))
    radii = rng.uniform(0.001, 0.01, size=(R, 1))
    ray_shape = RayShape.CONE if shape == "cone" else RayShape.CYLINDER
    mean, cov = ipe.cast_rays(
        jnp.asarray(t_vals), jnp.asarray(origins), jnp.asarray(directions),
        jnp.asarray(radii), ray_shape,
    )
    assert mean.shape == (R, S, 3)
    for r in range(R):
        m_ref, c_ref = oracle.cast_ray(
            t_vals[r], origins[r], directions[r], radii[r, 0], shape
        )
        np.testing.assert_allclose(mean[r], m_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(cov[r], c_ref, rtol=1e-4, atol=1e-5)


def test_integrated_pos_enc_matches_oracle(rng):
    R, S = 3, 5
    min_deg, max_deg = 0, 16
    mean = rng.normal(size=(R, S, 3))
    cov = rng.uniform(0, 0.2, size=(R, S, 3))
    feats = ipe.integrated_pos_enc(
        (jnp.asarray(mean), jnp.asarray(cov)), min_deg, max_deg
    )
    assert feats.shape == (R, S, 2 * (max_deg - min_deg) * 3)
    for r in range(R):
        for s in range(S):
            ref = oracle.integrated_pos_enc(mean[r, s], cov[r, s],
                                            min_deg, max_deg)
            np.testing.assert_allclose(
                feats[r, s], ref, rtol=1e-4, atol=1e-5
            )


def test_ipe_high_freq_attenuation():
    """Higher variance must attenuate high frequencies more (mip-NeRF's
    entire point)."""
    mean = jnp.asarray([[0.3, -0.2, 0.7]])
    small = ipe.integrated_pos_enc((mean, jnp.full((1, 3), 1e-6)), 0, 8)
    large = ipe.integrated_pos_enc((mean, jnp.full((1, 3), 1.0)), 0, 8)
    # magnitude of the top-frequency block shrinks under large variance
    assert jnp.max(jnp.abs(large[0, -6:])) < 1e-3
    assert jnp.max(jnp.abs(small[0, -6:])) > 1e-2


def test_pos_enc_matches_oracle(rng):
    x = rng.normal(size=(6, 3))
    feats = ipe.pos_enc(jnp.asarray(x), 0, 4)
    assert feats.shape == (6, 3 + 2 * 4 * 3)
    for i in range(6):
        np.testing.assert_allclose(
            feats[i], oracle.pos_enc(x[i], 0, 4), rtol=1e-5, atol=1e-6
        )


def test_conical_frustum_reduces_to_point_at_zero_width(rng):
    """As t1 -> t0 and radius -> 0, mean -> t0*d and variance -> 0."""
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t0 = jnp.full((1, 1), 3.0)
    mean, cov = ipe.conical_frustum_to_gaussian(
        d, t0, t0 + 1e-6, jnp.full((1, 1), 1e-8)
    )
    np.testing.assert_allclose(mean[0, 0], [0, 0, -3.0], atol=1e-4)
    np.testing.assert_allclose(cov[0, 0], 0.0, atol=1e-6)


# ---------------------------------------------------------------------------
# Fast transcendentals (ops/fastmath.py) and the fast_ipe encode path
# ---------------------------------------------------------------------------


def test_fastmath_accuracy_vs_float64():
    """fast_sin/cos within 5e-7 over the live-frequency range (|x| <= 4096
    — frequencies with larger |y| are exp-damped to zero in the IPE, see
    fastmath module docstring); fast_exp_neg within 2e-5 relative."""
    from nerf_or_nothing_tpu.ops.fastmath import (
        fast_cos, fast_exp_neg, fast_sin,
    )

    rng = np.random.default_rng(0)
    x = (rng.uniform(-1, 1, 100_000) * 4096.0).astype(np.float32)
    assert np.max(np.abs(
        np.asarray(fast_sin(jnp.asarray(x))) - np.sin(x.astype(np.float64))
    )) < 5e-7
    assert np.max(np.abs(
        np.asarray(fast_cos(jnp.asarray(x))) - np.cos(x.astype(np.float64))
    )) < 5e-7

    from nerf_or_nothing_tpu.ops.fastmath import fast_sincos

    s, c = fast_sincos(jnp.asarray(x))
    assert np.max(np.abs(np.asarray(s) - np.sin(x.astype(np.float64)))) \
        < 5e-7
    assert np.max(np.abs(np.asarray(c) - np.cos(x.astype(np.float64)))) \
        < 1e-6

    xe = rng.uniform(0, 80, 100_000).astype(np.float32)
    ref = np.exp(-xe.astype(np.float64))
    got = np.asarray(fast_exp_neg(jnp.asarray(xe)))
    assert np.max(np.abs(got - ref) / ref) < 2e-5
    # hard zeros past the underflow cutoff, no NaN/inf anywhere
    big = np.asarray(fast_exp_neg(jnp.asarray([100.0, 1e6, 1e30])))
    assert (big == 0.0).all()


def test_integrated_pos_enc_fast_matches_exact():
    """fast=True features match the exact encode to well below the bf16
    output quantum on realistic sampled Gaussians (means within the scene
    bound, variances from actual frustum casting)."""
    rng = np.random.default_rng(1)
    R, S = 16, 32
    origins = rng.uniform(-0.5, 0.5, (R, 3))
    dirs = rng.normal(size=(R, 3))
    radii = rng.uniform(1e-3, 5e-3, (R, 1))
    t_vals = np.sort(rng.uniform(2.0, 6.0, (R, S + 1)), axis=-1)
    means, covs = ipe.cast_rays(
        jnp.asarray(t_vals), jnp.asarray(origins), jnp.asarray(dirs),
        jnp.asarray(radii), RayShape.CONE,
    )
    exact = ipe.integrated_pos_enc((means, covs), 0, 16)
    fast = ipe.integrated_pos_enc((means, covs), 0, 16, fast=True)
    # bf16 quantum near 1.0 is ~4e-3; require 100x tighter.
    assert float(jnp.max(jnp.abs(exact - fast))) < 4e-5


def test_integrated_pos_enc_split_matches_interleaved():
    """The transposed sin/cos halves re-interleave exactly to the
    reference-layout features (same products, same transcendentals —
    only the layout differs)."""
    rng = np.random.default_rng(2)
    R, S, F = 4, 8, 16
    means = jnp.asarray(rng.normal(size=(R, S, 3)) * 2.0)
    covs = jnp.asarray(rng.uniform(0, 0.1, (R, S, 3)))
    inter = ipe.integrated_pos_enc((means, covs), 0, F)
    s48, c48 = ipe.integrated_pos_enc_split((means, covs), 0, F)
    n = R * S
    assert s48.shape == (3 * F, n) and c48.shape == (3 * F, n)
    # interleaved row order: per frequency i, [sin(3) | cos(3)]
    re = np.zeros((n, 6 * F), np.float32)
    for i in range(F):
        re[:, 6 * i : 6 * i + 3] = np.asarray(s48[3 * i : 3 * i + 3]).T
        re[:, 6 * i + 3 : 6 * i + 6] = np.asarray(c48[3 * i : 3 * i + 3]).T
    np.testing.assert_allclose(
        re.reshape(R, S, 6 * F), np.asarray(inter), rtol=1e-6, atol=1e-6
    )


def test_integrated_pos_enc_xt_matches_interleaved():
    """The one-fusion transposed encode equals the interleaved features
    transposed (cos rows computed as sin(y + pi/2))."""
    rng = np.random.default_rng(4)
    R, S, F = 4, 8, 16
    means = jnp.asarray(rng.normal(size=(R, S, 3)) * 2.0)
    covs = jnp.asarray(rng.uniform(0, 0.1, (R, S, 3)))
    inter = ipe.integrated_pos_enc((means, covs), 0, F)
    xt = ipe.integrated_pos_enc_xt((means, covs), 0, F)
    assert xt.shape == (6 * F, R * S)
    np.testing.assert_allclose(
        np.asarray(xt).T.reshape(R, S, 6 * F), np.asarray(inter),
        rtol=1e-5, atol=2e-5,
    )
