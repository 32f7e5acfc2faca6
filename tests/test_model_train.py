"""Model forward, loss, optimizer, LR schedule, and overfit tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reference_oracle as oracle
from nerf_or_nothing_tpu.config import Config, tiny_config
from nerf_or_nothing_tpu.models import mipnerf, mlp as mlp_lib
from nerf_or_nothing_tpu.ops.math_utils import learning_rate_decay
from nerf_or_nothing_tpu.rays import Rays
from nerf_or_nothing_tpu.train import (
    adam_update,
    init_train_state,
    make_jitted_train_step,
)


def make_rays(R, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((R, 1), np.float32)
    return Rays(
        jnp.zeros((R, 3)), jnp.asarray(d), jnp.asarray(vd),
        jnp.asarray(ones * 0.005), jnp.asarray(ones * 2.0),
        jnp.asarray(ones * 6.0), jnp.asarray(ones),
    )


def test_mlp_layer_dims_match_reference():
    """Default dims must be the reference's (AcceleratedMLP.cpp:173-193):
    w0[96,256]; w1..3,w5..7[256,256]; w4[352,256] skip; density[256,1];
    view[283,128]; rgb[128,3] — ~494k params."""
    cfg = Config()
    dims = mlp_lib.layer_dims(cfg)
    assert dims[0] == (96, 256)
    assert dims[4] == (256 + 96, 256)
    for i in (1, 2, 3, 5, 6, 7):
        assert dims[i] == (256, 256)
    assert dims[8] == (256, 1)
    assert dims[9] == (256 + 27, 128)
    assert dims[10] == (128, 3)
    n = mlp_lib.num_params(cfg)
    expected = (
        96 * 256 + 256
        + 6 * (256 * 256 + 256)
        + 352 * 256 + 256
        + 256 * 1 + 1
        + 283 * 128 + 128
        + 128 * 3 + 3
    )
    assert n == expected, (n, expected)


def test_mlp_flat_roundtrip():
    cfg = tiny_config()
    params = mlp_lib.init_mlp(jax.random.PRNGKey(0), cfg)
    flat = mlp_lib.export_flat(params)
    assert flat.size == mlp_lib.num_params(cfg)
    back = mlp_lib.import_flat(flat, cfg)
    for (w0, b0), (w1, b1) in zip(params, back):
        np.testing.assert_array_equal(w0, w1)
        np.testing.assert_array_equal(b0, b1)


def test_mlp_skip_connection_uses_input():
    """Zeroing the skip-concat columns of layer 4 must change the output
    (i.e. the raw encoded input genuinely reaches layer skip_layer)."""
    cfg = Config(net_depth=8, net_width=32, net_width_condition=16,
                 max_deg_point=4, use_pallas=False)
    params = mlp_lib.init_mlp(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, cfg.location_features))
    d = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.direction_features))
    out1, _ = mlp_lib.apply_mlp(params, cfg, x, d)
    w4, b4 = params[4]
    params2 = list(params)
    params2[4] = (w4.at[cfg.net_width:, :].set(0.0), b4)
    out2, _ = mlp_lib.apply_mlp(params2, cfg, x, d)
    assert not np.allclose(out1, out2)


def test_render_rays_shapes_and_levels():
    cfg = tiny_config(num_levels=2, num_samples=16, batch_size=8)
    params = mlp_lib.init_mlp(jax.random.PRNGKey(0), cfg)
    rays = make_rays(8)
    results = mipnerf.render_rays(
        params, cfg, jax.random.PRNGKey(1), rays,
        randomized=True, white_bkgd=True,
    )
    assert len(results) == 2
    for res in results:
        assert res.rgb.shape == (8, 3)
        assert res.distance.shape == (8,)
        assert res.acc.shape == (8,)
        assert res.weights.shape == (8, 16)
        assert bool(jnp.all(jnp.isfinite(res.rgb)))


def test_render_rays_full_covariance_matches_diag():
    """diag_covariance=False carries full 3x3 Gaussians through sampling and
    IPE (LiftGaussian/IPE non-diag branches, MipHelpers.cs:367-390, :429-471)
    and must reproduce the diagonal path's render exactly: the IPE consumes
    only the per-axis variance, and the full form's diagonal equals the
    diagonal form by construction."""
    cfg = tiny_config(batch_size=8, num_samples=16, randomized=False)
    cfg_full = cfg.replace(diag_covariance=False)
    params = mlp_lib.init_mlp(jax.random.PRNGKey(0), cfg)
    rays = make_rays(cfg.batch_size)
    key = jax.random.PRNGKey(1)
    out_d = mipnerf.render_rays(params, cfg, key, rays, False, True)
    out_f = mipnerf.render_rays(params, cfg_full, key, rays, False, True)
    for rd, rf in zip(out_d, out_f):
        np.testing.assert_allclose(rd.rgb, rf.rgb, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            rd.weights, rf.weights, rtol=1e-5, atol=1e-6
        )


def test_cast_rays_full_covariance_matches_oracle():
    """Non-diag cast_rays vs the scalar oracle's full-covariance branch."""
    from nerf_or_nothing_tpu.config import RayShape
    from nerf_or_nothing_tpu.ops.ipe import cast_rays

    rng = np.random.default_rng(3)
    R, S = 4, 6
    t_vals = np.sort(rng.uniform(2, 6, size=(R, S + 1)), axis=-1)
    origins = rng.normal(size=(R, 3))
    dirs = rng.normal(size=(R, 3))
    radii = rng.uniform(0.001, 0.01, size=(R, 1))
    mean, cov = cast_rays(
        jnp.asarray(t_vals), jnp.asarray(origins), jnp.asarray(dirs),
        jnp.asarray(radii), RayShape.CONE, diag=False,
    )
    assert cov.shape == (R, S, 3, 3)
    for r in range(R):
        m_ref, c_ref = oracle.cast_ray(
            t_vals[r], origins[r], dirs[r], radii[r, 0], "cone", diag=False
        )
        np.testing.assert_allclose(mean[r], m_ref, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(cov[r], c_ref, rtol=1e-4, atol=1e-6)


def test_rgb_padding_range():
    """Activated rgb must lie in [-p, 1+p] (MipNerfModel.cs:82)."""
    cfg = tiny_config(num_samples=8)
    params = mlp_lib.init_mlp(jax.random.PRNGKey(3), cfg)
    rays = make_rays(16)
    results = mipnerf.render_rays(
        params, cfg, jax.random.PRNGKey(1), rays,
        randomized=False, white_bkgd=False,
    )
    # composite of per-sample rgb in [-p, 1+p] weighted by weights<=1
    assert bool(jnp.all(results[-1].rgb >= -cfg.rgb_padding - 1e-5))
    assert bool(jnp.all(results[-1].rgb <= 1.0 + cfg.rgb_padding + 1e-5))


def test_multiscale_loss_coarse_weighting():
    cfg = tiny_config(coarse_loss_mult=0.1)
    from nerf_or_nothing_tpu.ops.render import RenderResult

    R = 4
    pixels = jnp.zeros((R, 3))
    mk = lambda v: RenderResult(
        jnp.full((R, 3), v), jnp.zeros((R,)), jnp.zeros((R,)),
        jnp.zeros((R, 2)),
    )
    total, losses = mipnerf.multiscale_loss(
        [mk(1.0), mk(2.0)], pixels, jnp.ones((R, 1)), cfg
    )
    np.testing.assert_allclose(losses, [3.0, 12.0], rtol=1e-6)
    np.testing.assert_allclose(total, 0.1 * 3.0 + 12.0, rtol=1e-6)


def test_multiscale_loss_mask_weights():
    cfg = tiny_config()
    from nerf_or_nothing_tpu.ops.render import RenderResult

    pixels = jnp.zeros((2, 3))
    res = RenderResult(
        jnp.stack([jnp.ones(3), 2 * jnp.ones(3)]),
        jnp.zeros(2), jnp.zeros(2), jnp.zeros((2, 2)),
    )
    lm = jnp.asarray([[1.0], [3.0]])
    total, _ = mipnerf.multiscale_loss([res], pixels, lm, cfg)
    # (1*3 + 3*12) / 4
    np.testing.assert_allclose(total, (3.0 + 36.0) / 4.0, rtol=1e-6)
    # disable_multiscale_loss forces mask = 1
    cfg2 = cfg.replace(disable_multiscale_loss=True)
    total2, _ = mipnerf.multiscale_loss([res], pixels, lm, cfg2)
    np.testing.assert_allclose(total2, (3.0 + 12.0) / 2.0, rtol=1e-6)


def test_adam_matches_reference_kernel():
    """adam_update vs the scalar transcription of adam_optimizer_step
    (accelerated_functions.cu:403-416)."""
    cfg = Config()
    rng = np.random.default_rng(0)
    p = rng.normal(size=(7,)).astype(np.float32)
    g = rng.normal(size=(7,)).astype(np.float32)
    m = rng.normal(size=(7,)).astype(np.float32) * 0.1
    v = np.abs(rng.normal(size=(7,))).astype(np.float32) * 0.1
    lr = 3e-4
    for t in (1, 2, 10):
        ours = adam_update(
            [(jnp.asarray(p), jnp.zeros(1))],
            [(jnp.asarray(g), jnp.zeros(1))],
            [(jnp.asarray(m), jnp.zeros(1))],
            [(jnp.asarray(v), jnp.zeros(1))],
            lr, jnp.asarray(t), cfg,
        )
        p_ref, m_ref, v_ref = oracle.adam_step(
            p.astype(np.float64), g, m.astype(np.float64),
            v.astype(np.float64), lr, t,
        )
        np.testing.assert_allclose(ours[0][0][0], p_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ours[1][0][0], m_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ours[2][0][0], v_ref, rtol=1e-5, atol=1e-6)


def test_learning_rate_decay_matches_oracle():
    for step in (0, 1, 100, 2500, 10_000, 500_000, 1_000_000):
        ours = float(learning_rate_decay(step, 5e-4, 5e-6, 1_000_000,
                                         2500, 0.01))
        ref = oracle.learning_rate_decay(step, 5e-4, 5e-6, 1_000_000,
                                         2500, 0.01)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_grad_clipping():
    from nerf_or_nothing_tpu.train import clip_grads

    g = [(jnp.full((4,), 10.0), jnp.full((2,), -10.0))]
    cfg = Config(grad_max_val=1.0)
    clipped, norm, _, gmax = clip_grads(g, cfg)
    assert bool(jnp.all(jnp.abs(clipped[0][0]) <= 1.0))
    cfg2 = Config(grad_max_norm=1.0)
    clipped2, norm2, cn2, _ = clip_grads(g, cfg2)
    total = jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(clipped2)))
    np.testing.assert_allclose(total, 1.0, rtol=1e-4)
    assert float(gmax) <= 1.0


def test_weight_decay_changes_gradient():
    cfg = tiny_config(num_samples=8, batch_size=4, weight_decay_mult=0.0)
    cfg_wd = cfg.replace(weight_decay_mult=0.1)
    rays = make_rays(4)
    pixels = jnp.full((4, 3), 0.5)
    s0 = init_train_state(cfg)
    step_a = make_jitted_train_step(cfg)
    step_b = make_jitted_train_step(cfg_wd)
    sa, _ = step_a(s0, rays, pixels)
    sb, _ = step_b(init_train_state(cfg_wd), rays, pixels)
    diffs = [
        float(jnp.max(jnp.abs(wa - wb)))
        for (wa, _), (wb, _) in zip(sa.params, sb.params)
    ]
    assert max(diffs) > 0


def test_overfit_tiny_batch():
    """BASELINE config 1 spirit: loss must fall sharply when overfitting a
    fixed tiny batch (golden convergence check, SURVEY.md §4)."""
    cfg = tiny_config(
        batch_size=32, num_samples=16, net_depth=2, net_width=32,
        net_width_condition=16, max_deg_point=6, randomized=False,
        lr_delay_steps=0, lr_init=5e-3, lr_final=5e-3, max_steps=1000,
    )
    state = init_train_state(cfg)
    rays = make_rays(32)
    pixels = jax.random.uniform(jax.random.PRNGKey(5), (32, 3),
                                minval=0.2, maxval=0.8)
    step = make_jitted_train_step(cfg)
    first = None
    for i in range(150):
        state, stats = step(state, rays, pixels)
        if first is None:
            first = float(stats.loss)
    last = float(stats.loss)
    assert last < first * 0.25, (first, last)


def test_train_step_determinism():
    cfg = tiny_config(batch_size=8, num_samples=8, net_depth=2, net_width=16,
                      net_width_condition=8, max_deg_point=4)
    rays = make_rays(8)
    pixels = jnp.full((8, 3), 0.3)
    step = make_jitted_train_step(cfg.replace(donate_params=False))
    s1, st1 = step(init_train_state(cfg), rays, pixels)
    s2, st2 = step(init_train_state(cfg), rays, pixels)
    assert float(st1.loss) == float(st2.loss)
    for (w1, _), (w2, _) in zip(s1.params, s2.params):
        np.testing.assert_array_equal(w1, w2)


def test_check_numerics_traps_nan():
    """cfg.check_numerics raises on NaN generation inside the jitted step
    (SURVEY.md §5.2 — the reference prints kernel errors and keeps going)."""
    import pytest

    from nerf_or_nothing_tpu.rays import Rays
    from nerf_or_nothing_tpu.train import (
        init_train_state, make_jitted_train_step,
    )

    cfg = tiny_config(batch_size=8, num_samples=8, net_depth=2, net_width=16,
                      net_width_condition=8, max_deg_point=4, num_levels=1,
                      check_numerics=True, use_pallas=False)
    state = init_train_state(cfg)
    step = make_jitted_train_step(cfg)
    n = cfg.batch_size
    d = np.random.default_rng(0).normal(size=(n, 3)).astype(np.float32)
    ones = np.ones((n, 1), np.float32)
    rays = Rays(jnp.zeros((n, 3)), jnp.asarray(d),
                jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True)),
                jnp.asarray(ones * 0.01), jnp.asarray(ones * 2.0),
                jnp.asarray(ones * 6.0), jnp.asarray(ones))
    pixels = jnp.full((n, 3), jnp.nan)  # poison
    with pytest.raises(Exception, match="nan"):
        step(state, rays, pixels)

    # clean inputs pass
    pixels_ok = jnp.full((n, 3), 0.5)
    state2, stats = step(state, rays, pixels_ok)
    assert np.isfinite(float(stats.loss))


def test_multi_step_matches_sequential_steps():
    """lax.scan multi-step (one dispatch for K steps) == K jitted steps:
    same PRNG chain, same LR positions, same params."""
    from nerf_or_nothing_tpu.train import make_jitted_multi_step

    cfg = tiny_config(
        batch_size=8, num_samples=8, num_levels=2, net_depth=3,
        net_width=32, net_width_condition=16, skip_layer=2, max_deg_point=4,
        randomized=True, donate_params=False, compute_dtype="float32",
        use_pallas=False,
    )
    rays = make_rays(cfg.batch_size)
    pixels = jnp.asarray(
        np.random.default_rng(1).uniform(size=(cfg.batch_size, 3))
        .astype(np.float32)
    )
    k = 5
    s_seq = init_train_state(cfg)
    step = make_jitted_train_step(cfg)
    stats_seq = []
    for _ in range(k):
        s_seq, st = step(s_seq, rays, pixels)
        stats_seq.append(float(st.loss))

    s_scan = init_train_state(cfg)
    rays_stack = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (k, *a.shape)), rays
    )
    pixels_stack = jnp.broadcast_to(pixels, (k, *pixels.shape))
    s_scan, st_scan = make_jitted_multi_step(cfg)(
        s_scan, rays_stack, pixels_stack
    )
    assert int(s_scan.step) == k
    np.testing.assert_allclose(
        np.asarray(st_scan.loss), np.asarray(stats_seq), rtol=1e-6
    )
    for (w1, b1), (w2, b2) in zip(s_seq.params, s_scan.params):
        np.testing.assert_allclose(
            np.asarray(w1), np.asarray(w2), rtol=1e-6, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(b1), np.asarray(b2), rtol=1e-6, atol=1e-8
        )
