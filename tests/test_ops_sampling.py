"""Sampling / resampling: distribution and fixed-u determinism tests.

PRNG streams can never match the reference's cuRAND bitwise, so following
SURVEY.md §7 the tests (a) compare the deterministic (fixed-u) inverse-CDF
path against the scalar oracle, and (b) check distributional properties of
the randomized path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reference_oracle as oracle
from nerf_or_nothing_tpu.config import RayShape
from nerf_or_nothing_tpu.ops import sampling


def test_unrandomized_linspace_in_t():
    R, S = 4, 16
    near = jnp.full((R, 1), 2.0)
    far = jnp.full((R, 1), 6.0)
    o = jnp.zeros((R, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (R, 1))
    radii = jnp.full((R, 1), 0.01)
    t_vals, (means, covs) = sampling.sample_along_rays(
        jax.random.PRNGKey(0), o, d, radii, S, near, far,
        randomized=False, lin_disp=False, ray_shape=RayShape.CONE,
    )
    np.testing.assert_allclose(
        t_vals[0], np.linspace(2.0, 6.0, S + 1), rtol=1e-6
    )
    assert means.shape == (R, S, 3)


def test_unrandomized_lin_disp():
    R, S = 2, 8
    near, far = 2.0, 6.0
    t_vals, _ = sampling.sample_along_rays(
        jax.random.PRNGKey(0),
        jnp.zeros((R, 3)),
        jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (R, 1)),
        jnp.full((R, 1), 0.01),
        S,
        jnp.full((R, 1), near),
        jnp.full((R, 1), far),
        randomized=False, lin_disp=True, ray_shape=RayShape.CONE,
    )
    t = np.linspace(0, 1, S + 1)
    expected = 1.0 / (1.0 / near * (1 - t) + 1.0 / far * t)
    np.testing.assert_allclose(t_vals[0], expected, rtol=1e-6)


def test_randomized_stratified_within_bins():
    """Jittered t-values stay sorted, inside [near, far], and each is within
    its stratum (the reference's shifted-midpoint jitter, MipHelpers.cs:625-629)."""
    R, S = 64, 32
    t_vals, _ = sampling.sample_along_rays(
        jax.random.PRNGKey(3),
        jnp.zeros((R, 3)),
        jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (R, 1)),
        jnp.full((R, 1), 0.01),
        S,
        jnp.full((R, 1), 2.0),
        jnp.full((R, 1), 6.0),
        randomized=True, lin_disp=False, ray_shape=RayShape.CONE,
    )
    t = np.asarray(t_vals)
    assert (np.diff(t, axis=-1) >= 0).all()
    assert (t >= 2.0 - 1e-6).all() and (t <= 6.0 + 1e-6).all()
    # each jittered value lies between its shifted-bin bounds
    base = np.linspace(2.0, 6.0, S + 1)
    mids = 0.5 * (base[:-1] + base[1:])
    lower = np.concatenate([[base[0]], mids])
    upper = np.concatenate([mids, [base[-1]]])
    assert (t >= lower - 1e-6).all() and (t <= upper + 1e-6).all()


def test_pdf_deterministic_path_matches_oracle():
    rng = np.random.default_rng(11)
    R, B, N = 5, 16, 17
    bins = np.sort(rng.uniform(2, 6, size=(R, B + 1)), axis=-1)
    weights = rng.uniform(0, 1, size=(R, B))
    out = sampling.sorted_piecewise_constant_pdf(
        jax.random.PRNGKey(0), jnp.asarray(bins), jnp.asarray(weights),
        N, randomized=False,
    )
    u = np.linspace(0, 1.0 - 1e-7, N)
    for r in range(R):
        ref = oracle.sorted_piecewise_constant_pdf(u, bins[r], weights[r])
        np.testing.assert_allclose(out[r], ref, rtol=1e-4, atol=1e-5)


def test_pdf_zero_weights_uniform():
    """All-zero weights pad to uniform -> samples spread over the range."""
    B, N = 8, 9
    bins = jnp.linspace(2.0, 6.0, B + 1)[None]
    weights = jnp.zeros((1, B))
    out = sampling.sorted_piecewise_constant_pdf(
        jax.random.PRNGKey(0), bins, weights, N, randomized=False
    )
    np.testing.assert_allclose(
        np.asarray(out[0]), np.linspace(2.0, 6.0, N), rtol=1e-3
    )


def test_pdf_concentrates_samples_in_heavy_bins():
    B, N = 16, 128
    bins = jnp.linspace(0.0, 1.0, B + 1)[None]
    weights = jnp.zeros((1, B)).at[0, 7].set(1.0)  # all mass in bin 7
    out = sampling.sorted_piecewise_constant_pdf(
        jax.random.PRNGKey(5), bins, weights, N, randomized=True
    )
    t = np.asarray(out[0])
    lo, hi = 7 / B, 8 / B
    frac_inside = np.mean((t >= lo - 1e-3) & (t <= hi + 1e-3))
    assert frac_inside > 0.95


def test_pdf_randomized_stratified_and_sorted():
    rng = np.random.default_rng(2)
    R, B, N = 8, 32, 33
    bins = np.sort(rng.uniform(2, 6, size=(R, B + 1)), axis=-1)
    weights = rng.uniform(0, 1, size=(R, B))
    out = sampling.sorted_piecewise_constant_pdf(
        jax.random.PRNGKey(9), jnp.asarray(bins), jnp.asarray(weights),
        N, randomized=True,
    )
    t = np.asarray(out)
    assert (np.diff(t, axis=-1) >= -1e-7).all()
    assert (t >= bins[:, :1] - 1e-6).all() and (t <= bins[:, -1:] + 1e-6).all()


def test_blurpool_matches_oracle():
    rng = np.random.default_rng(4)
    w = rng.uniform(0, 1, size=(16,))
    # reach the private blurpool through resample_along_rays by checking the
    # oracle's blurpool against a direct recomputation
    w_pad = np.concatenate([w[:1], w, w[-1:]])
    w_max = np.maximum(w_pad[:-1], w_pad[1:])
    expected = 0.5 * (w_max[:-1] + w_max[1:]) + 0.01
    np.testing.assert_allclose(oracle.blurpool(w, 0.01), expected)


def test_resample_along_rays_shapes_and_range():
    rng = np.random.default_rng(6)
    R, S = 4, 32
    t_vals = np.sort(rng.uniform(2, 6, size=(R, S + 1)), axis=-1)
    weights = rng.uniform(0, 1, size=(R, S))
    new_t, (means, covs) = sampling.resample_along_rays(
        jax.random.PRNGKey(1),
        jnp.zeros((R, 3)),
        jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (R, 1)),
        jnp.full((R, 1), 0.01),
        jnp.asarray(t_vals),
        jnp.asarray(weights),
        randomized=True,
        ray_shape=RayShape.CONE,
        resample_padding=0.01,
    )
    assert new_t.shape == (R, S + 1)
    assert means.shape == (R, S, 3)
    t = np.asarray(new_t)
    assert (np.diff(t, axis=-1) >= -1e-7).all()
    assert (t >= t_vals[:, :1] - 1e-6).all()
    assert (t <= t_vals[:, -1:] + 1e-6).all()


def test_resample_stop_grad_blocks_backprop():
    """StopLevelGrad (MipNerfModel.cs:13): no gradient flows into the coarse
    weights through resampling."""
    R, S = 2, 8
    t_vals = jnp.tile(jnp.linspace(2.0, 6.0, S + 1)[None], (R, 1))

    def f(weights):
        new_t, _ = sampling.resample_along_rays(
            jax.random.PRNGKey(0),
            jnp.zeros((R, 3)),
            jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (R, 1)),
            jnp.full((R, 1), 0.01),
            t_vals, weights,
            randomized=False, ray_shape=RayShape.CONE,
            resample_padding=0.01, stop_grad=True,
        )
        return jnp.sum(new_t)

    g = jax.grad(f)(jnp.full((R, S), 0.5))
    np.testing.assert_allclose(g, 0.0)
