"""Shared on-chip numerics-parity oracle for the fused-level kernel.

One definition serves both gates — ``tests/test_tpu_parity.py`` (pytest,
real-hardware runs) and ``benchmarks/verify_tpu_parity.py`` (standalone
JSON gate) — so they cannot drift apart.

The oracle is the unfused level loss (plain-XLA MLP + activations +
composite, reference semantics MipHelpers.cs:472-610 / Program.cs:66-89)
differentiated with ``jax.grad``; the kernel under test is
``fused_level_train``. Error is reported NORMALIZED to the tolerance band
``atol + rtol*|b| + rtol*max|b|`` (f32 matmuls on TPU execute as bf16x3
passes, so bands are atol+rtol, not bitwise; near-zero early-layer
gradients make pure relative error meaningless).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from nerf_or_nothing_tpu.config import Config
from nerf_or_nothing_tpu.models import mlp as mlp_lib
from nerf_or_nothing_tpu.ops import render

# Parity bands per compute dtype: f32 matmuls on TPU run as bf16x3 passes
# (not true f32), bf16 compute is bf16x1.
PARITY_BANDS = {"float32": (1e-6, 1e-3), "bfloat16": (2e-3, 3e-2)}


def oracle_level_loss(params, cfg: Config, x_enc, dir_enc, t_vals, dirs,
                      pixels, mask, level_weight, white_bkgd):
    """Unfused one-level train loss (the jax.grad oracle).

    Same math as the fused kernel: MLP -> sigmoid/rgb-padding +
    softplus/density-bias -> composite -> masked multiscale MSE term
    (Program.cs:66-89 semantics). Returns (loss, (comp, weights))."""
    raw_rgb, raw_den = mlp_lib.apply_mlp(params, cfg, x_enc, dir_enc)
    rgb = jax.nn.sigmoid(raw_rgb)
    rgb = rgb * (1.0 + 2.0 * cfg.rgb_padding) - cfg.rgb_padding
    density = jax.nn.softplus(raw_den[..., 0] + cfg.density_bias)
    comp, acc, weights = render.composite(
        rgb, density, t_vals, dirs, white_bkgd
    )
    denom = jnp.maximum(jnp.sum(mask), 1e-10)
    sq = jnp.sum((comp - pixels) ** 2, axis=-1)
    return level_weight * jnp.sum(mask * sq) / denom, (comp, weights)


def parity_inputs(dtype: str, num_samples: int = 128, num_rays: int = 32,
                  seed: int = 0):
    """Deterministic flagship-shape inputs for the hardware parity gate."""
    cfg = Config(compute_dtype=dtype, num_samples=num_samples)
    S, R = cfg.num_samples, num_rays
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    params = mlp_lib.init_mlp(ks[0], cfg)
    x_enc = jax.random.normal(ks[1], (R, S, cfg.location_features)) * 0.5
    dir_enc = jax.random.normal(ks[2], (R, cfg.direction_features)) * 0.5
    t_vals = jnp.sort(
        jax.random.uniform(ks[3], (R, S + 1), minval=2.0, maxval=6.0),
        axis=-1,
    )
    dirs = jax.random.normal(ks[4], (R, 3))
    pixels = jax.random.uniform(ks[5], (R, 3))
    return cfg, params, x_enc, dir_enc, t_vals, dirs, pixels


def normalized_err(a, b, atol: float, rtol: float) -> float:
    """max |a-b| / band with band = atol + rtol*|b| + rtol*max|b|.

    < 1.0 means within tolerance; the value is the fraction of the band
    consumed (the parity MARGIN is 1 - value)."""
    band = atol + rtol * jnp.abs(b) + rtol * jnp.max(jnp.abs(b))
    return float(jnp.max(jnp.abs(a - b) / band))


def level_parity_errors(dtype: str, atol=None, rtol=None,
                        oracle_precision=None,
                        kernel_precision=None) -> Tuple[float, dict]:
    """Run fused_level_train vs the jax.grad oracle; per-tensor errors.

    Args:
      oracle_precision: optional jax matmul precision for the ORACLE side
        only (e.g. "highest" = f32 via bf16x6 passes on TPU). Comparing the
        default-precision error against the "highest" one attributes the
        parity gap: if the error GROWS against the more exact oracle, the
        band is being consumed by the shared bf16x3 hardware error, not by
        kernel algorithm error.
      kernel_precision: optional matmul precision for the KERNEL side.
        With BOTH sides at "highest", the comparison isolates ALGORITHM
        parity from the f32-on-TPU bf16x3 matmul floor.
    Returns:
      (worst_normalized_err, {tensor_name: normalized_err}).
    """
    from nerf_or_nothing_tpu.kernels.fused_level import fused_level_train

    if atol is None or rtol is None:
        atol, rtol = PARITY_BANDS[dtype]
    cfg, params, x_enc, dir_enc, t_vals, dirs, pixels = parity_inputs(dtype)
    R = pixels.shape[0]
    mask = jnp.ones((R,))
    lw = 0.1
    gsc = (lw * 2.0 * mask / jnp.maximum(jnp.sum(mask), 1e-10))[:, None]

    if kernel_precision is not None:
        with jax.default_matmul_precision(kernel_precision):
            comp, _, wts, dp = fused_level_train(
                params, cfg, x_enc, dir_enc, t_vals, dirs, pixels, gsc,
                True
            )
    else:
        comp, _, wts, dp = fused_level_train(
            params, cfg, x_enc, dir_enc, t_vals, dirs, pixels, gsc, True
        )

    def oracle(p):
        return oracle_level_loss(p, cfg, x_enc, dir_enc, t_vals, dirs,
                                 pixels, mask, lw, True)

    if oracle_precision is not None:
        with jax.default_matmul_precision(oracle_precision):
            (_, (comp_o, wts_o)), grads = jax.value_and_grad(
                oracle, has_aux=True)(params)
    else:
        (_, (comp_o, wts_o)), grads = jax.value_and_grad(
            oracle, has_aux=True)(params)

    errs = {
        "comp": normalized_err(comp, comp_o, atol, rtol),
        "weights": normalized_err(wts, wts_o, atol, rtol),
    }
    for i, ((dw, db), (dwo, dbo)) in enumerate(zip(dp, grads)):
        errs[f"dw{i}"] = normalized_err(dw, dwo, atol, rtol)
        errs[f"db{i}"] = normalized_err(db, dbo, atol, rtol)
    return max(errs.values()), errs
