"""Hardware-shape kernel parity: compiled Mosaic vs the jax.grad oracle.

The other kernel tests pin the math with TINY tiles (8-32 rows), which
only the Pallas interpreter accepts — on real TPU those block shapes
cannot lower (lane dim must be 128-divisible or whole-array). This module
is the REAL-HARDWARE numerics gate: flagship dims (8x256 MLP, S=128,
tile=2048), skipped automatically off-TPU (where the interpret-mode tests
already cover the math). The oracle/input/band definitions are shared with
``benchmarks/verify_tpu_parity.py`` via ``utils.parity`` so the two gates
cannot drift apart.
"""

import jax
import jax.numpy as jnp
import pytest

from nerf_or_nothing_tpu.kernels.fused_level import (
    fused_level_render,
    fused_level_train,
)
from nerf_or_nothing_tpu.models import mlp as mlp_lib
from nerf_or_nothing_tpu.ops import render
from nerf_or_nothing_tpu.utils.parity import (
    PARITY_BANDS,
    normalized_err,
    oracle_level_loss,
    parity_inputs,
)

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="real-hardware Mosaic lowering gate; interpret-mode tests "
    "cover the math off-TPU",
)


def _assert_close(a, b, atol, rtol):
    worst = normalized_err(a, b, atol, rtol)
    assert worst < 1.0, worst


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_fused_level_train_hardware_parity(dtype):
    atol, rtol = PARITY_BANDS[dtype]
    cfg, params, x_enc, dir_enc, t_vals, dirs, pixels = parity_inputs(dtype)
    R = pixels.shape[0]
    mask = jnp.ones((R,))
    lw = 0.1
    gsc = (lw * 2.0 * mask / jnp.maximum(jnp.sum(mask), 1e-10))[:, None]

    comp, _, wts, dp = fused_level_train(
        params, cfg, x_enc, dir_enc, t_vals, dirs, pixels, gsc, True
    )
    (_, (comp_o, wts_o)), grads = jax.value_and_grad(
        lambda p: oracle_level_loss(p, cfg, x_enc, dir_enc, t_vals, dirs,
                                    pixels, mask, lw, True),
        has_aux=True,
    )(params)
    _assert_close(comp, comp_o, atol, rtol)
    _assert_close(wts, wts_o, atol, rtol)
    for (dw, db), (dwo, dbo) in zip(dp, grads):
        _assert_close(dw, dwo, atol, rtol)
        _assert_close(db, dbo, atol, rtol)


def test_fused_level_algorithm_parity_highest_precision():
    """The ALGORITHM gate: kernel AND oracle at matmul precision
    "highest" (bf16x6 ~ true f32), isolating kernel math from the
    f32-on-TPU bf16x3 hardware floor. At default precision the band is
    ~0.92 consumed because kernel and oracle SHARE the bf16x3 error
    (proven: against a highest-precision oracle alone the error is 6.3x
    the band); with both sides exact the kernel must sit well inside —
    round-5 measurement: 0.15 of band."""
    from nerf_or_nothing_tpu.utils.parity import level_parity_errors

    worst, errs = level_parity_errors(
        "float32", oracle_precision="highest", kernel_precision="highest"
    )
    assert worst < 0.5, (worst, max(errs, key=errs.get))


def test_fused_level_render_hardware_parity():
    cfg, params, x_enc, dir_enc, t_vals, dirs, _ = parity_inputs("float32")
    comp, acc, wts = fused_level_render(
        params, cfg, x_enc, dir_enc, t_vals, dirs, True
    )
    raw_rgb, raw_den = mlp_lib.apply_mlp(params, cfg, x_enc, dir_enc)
    rgb = jax.nn.sigmoid(raw_rgb)
    rgb = rgb * (1.0 + 2.0 * cfg.rgb_padding) - cfg.rgb_padding
    density = jax.nn.softplus(raw_den[..., 0] + cfg.density_bias)
    comp_o, acc_o, wts_o = render.composite(
        rgb, density, t_vals, dirs, True
    )
    _assert_close(comp, comp_o, 1e-6, 1e-3)
    _assert_close(acc, acc_o, 1e-6, 1e-3)
    _assert_close(wts, wts_o, 1e-6, 1e-3)


def test_fused_level_render_in_kernel_ipe_hardware_parity():
    """The mv-mode render kernel (in-kernel IPE — the fuse_ipe_render
    default eval path since round 5) compiled on real hardware must match
    the unfused oracle fed the XLA-encoded features. Guards the Mosaic
    lowering of the in-kernel encode (fast_sincos polynomials, scale
    iota, [3, tile] blocks) at flagship shapes."""
    from nerf_or_nothing_tpu.ops import ipe as ipe_lib

    cfg, params, _, dir_enc, t_vals, dirs, _ = parity_inputs("float32")
    R, S = t_vals.shape[0], cfg.num_samples
    ks = jax.random.split(jax.random.PRNGKey(21), 2)
    means = jax.random.normal(ks[0], (R, S, 3)) * 0.5
    covs = jax.random.uniform(ks[1], (R, S, 3)) * 0.1

    comp, acc, wts = fused_level_render(
        params, cfg, None, dir_enc, t_vals, dirs, True,
        means_covs=(means, covs),
    )
    x_enc = ipe_lib.integrated_pos_enc(
        (means, covs), cfg.min_deg_point, cfg.max_deg_point,
        fast=cfg.fast_ipe,
    )
    raw_rgb, raw_den = mlp_lib.apply_mlp(params, cfg, x_enc, dir_enc)
    rgb = jax.nn.sigmoid(raw_rgb)
    rgb = rgb * (1.0 + 2.0 * cfg.rgb_padding) - cfg.rgb_padding
    density = jax.nn.softplus(raw_den[..., 0] + cfg.density_bias)
    comp_o, acc_o, wts_o = render.composite(rgb, density, t_vals, dirs,
                                            True)
    # fast_sincos (kernel) vs fast_sin/fast_cos (oracle encode) differ at
    # ~5e-7 per feature; band widened accordingly vs the exact-encode
    # render test.
    _assert_close(comp, comp_o, 1e-5, 1e-3)
    _assert_close(acc, acc_o, 1e-5, 1e-3)
    _assert_close(wts, wts_o, 1e-5, 1e-3)


@pytest.mark.parametrize("samples", [64, 256])
def test_fused_level_non128_samples_lowers_on_hardware(samples):
    """S != 128 cannot use the channel-plane composite on real TPU (Mosaic
    lowers the flat->[RT, S] plane reshape only at native 128-lane width;
    S=64/256 hit 'unsupported shape cast') — the kernel must fall back to
    the row-major composite and still compile + run. Regression for the
    round-4 bench_quality breakage."""
    cfg, params, x_enc, dir_enc, t_vals, dirs, pixels = parity_inputs(
        "float32", num_samples=samples, num_rays=16
    )
    R = pixels.shape[0]
    mask = jnp.ones((R,))
    gsc = (0.1 * 2.0 * mask / jnp.maximum(jnp.sum(mask), 1e-10))[:, None]
    comp, _, wts, dp = fused_level_train(
        params, cfg, x_enc, dir_enc, t_vals, dirs, pixels, gsc, True
    )
    (_, (comp_o, wts_o)), grads = jax.value_and_grad(
        lambda p: oracle_level_loss(p, cfg, x_enc, dir_enc, t_vals, dirs,
                                    pixels, mask, 0.1, True),
        has_aux=True,
    )(params)
    # atol 1e-5: near-zero db values accumulate over up to 4096 rows in a
    # different order than the oracle's XLA reduction — ~1e-6 abs noise.
    _assert_close(comp, comp_o, 1e-5, 1e-3)
    _assert_close(wts, wts_o, 1e-5, 1e-3)
    for (dw, db), (dwo, dbo) in zip(dp, grads):
        _assert_close(dw, dwo, 1e-5, 1e-3)
        _assert_close(db, dbo, 1e-5, 1e-3)
