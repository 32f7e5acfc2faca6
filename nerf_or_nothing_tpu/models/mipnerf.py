"""The MipNeRF model: hierarchical sample -> encode -> MLP -> composite.

TPU-native re-design of ``ScratchNerf/MipNerfModel.cs`` (both the C# scalar
path ``Call``/``GetGradient`` at :36-200 and the CUDA orchestration
``AcceleratedMipNeRF.cpp:52-144``): the per-level loop is a Python-unrolled
(static ``num_levels``) sequence of fully batched ops under one ``jit``;
differentiation is ``jax.grad`` end-to-end (the reference's hand-written
backward is recovered exactly by the custom VJPs in ``ops/render.py`` and the
fused Pallas backward).

Semantics implemented (the *correct* C# ones, see SURVEY.md §2.10):
  - level 0: stratified sampling; level >0: blurpool+PDF resampling from the
    previous level's weights with stop-gradient (StopLevelGrad,
    MipNerfModel.cs:13, carried correctly as in GetGradient :126-133 — the
    inference-path level-carry bug is NOT replicated);
  - IPE over conical/cylindrical frustum Gaussians, degrees [0, 16);
  - view PE with identity, degree 4, of the viewdir (canonical) or the raw
    direction (reference quirk, MipNerfModel.cs:70) per config;
  - rgb = sigmoid(raw) * (1 + 2*rgb_padding) - rgb_padding
    (MipNerfModel.cs:82);
  - density = softplus(raw + density_bias) (MipNerfModel.cs:20-21);
  - white-background compositing.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp

from nerf_or_nothing_tpu.config import Config
from nerf_or_nothing_tpu.models import mlp as mlp_lib
from nerf_or_nothing_tpu.ops import ipe, render, sampling
from nerf_or_nothing_tpu.rays import Rays


def _compute_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


# ---------------------------------------------------------------------------
# Shared per-level building blocks. Both training paths — jax.grad over
# ``render_rays`` and the fused-level kernel path
# (train._fused_level_value_and_grad) — and the inference path are built
# from THESE helpers, so a per-level feature (a new level count, a new
# sampling rule, a new loss mask) lands exactly once.
# ---------------------------------------------------------------------------


def encode_dirs(cfg: Config, rays: Rays) -> jnp.ndarray:
    """View-direction PE: viewdirs (canonical) or the raw direction (the
    reference quirk, MipNerfModel.cs:70) per ``cfg.use_viewdirs``."""
    dir_to_encode = rays.viewdirs if cfg.use_viewdirs else rays.directions
    return ipe.pos_enc(dir_to_encode, 0, cfg.deg_view)


def sample_level(cfg: Config, level_key, rays: Rays, i_level: int, t_vals,
                 weights, randomized: bool, stop_grad: bool):
    """Level ``i_level``'s sample Gaussians: stratified at level 0,
    blurpool+PDF resampling from the previous level's weights after
    (MipNerfModel.cs:36-66). Returns (t_vals, (means, covs))."""
    if i_level == 0:
        return sampling.sample_along_rays(
            level_key, rays.origins, rays.directions, rays.radii,
            cfg.num_samples, rays.near, rays.far, randomized,
            cfg.lin_disp, cfg.ray_shape, diag=cfg.diag_covariance,
        )
    return sampling.resample_along_rays(
        level_key, rays.origins, rays.directions, rays.radii,
        t_vals, weights, randomized, cfg.ray_shape,
        cfg.resample_padding, stop_grad=stop_grad,
        diag=cfg.diag_covariance,
    )


def encode_samples(cfg: Config, means, covs, in_kernel: bool, dtype=None,
                   render: bool = False):
    """IPE features for the MLP, in the form the consumer wants.

    Returns (x_enc, means_covs) — exactly one is non-None. ``x_enc`` is
    the interleaved [R, S, F] tensor, or (with ``cfg.pair_ipe`` /
    ``cfg.xt_ipe`` on the fused-kernel path) a transposed layout; with
    ``cfg.fuse_ipe`` — or ``cfg.fuse_ipe_render`` on the inference path
    (``render=True``) — the raw (means, covs) pass through and the
    kernel encodes internally."""
    if (in_kernel and cfg.diag_covariance
            and (cfg.fuse_ipe or (render and cfg.fuse_ipe_render))):
        return None, (means, covs)
    if in_kernel and cfg.xt_ipe:
        return ipe.integrated_pos_enc_xt(
            (means, covs), cfg.min_deg_point, cfg.max_deg_point,
            diag=cfg.diag_covariance, dtype=dtype, fast=cfg.fast_ipe,
        ), None
    if in_kernel and cfg.pair_ipe:
        return ipe.integrated_pos_enc_split(
            (means, covs), cfg.min_deg_point, cfg.max_deg_point,
            diag=cfg.diag_covariance, dtype=dtype, fast=cfg.fast_ipe,
        ), None
    x_enc = ipe.integrated_pos_enc(
        (means, covs), cfg.min_deg_point, cfg.max_deg_point,
        diag=cfg.diag_covariance,
        # bf16 inside the encode fusion: halves the [R*S, F] HBM write and
        # feeds the Pallas kernel its compute dtype directly.
        dtype=dtype,
        fast=cfg.fast_ipe,
    )
    return x_enc, None


def loss_normalizer(cfg: Config, loss_mult: jnp.ndarray, axis_name=None):
    """Multiscale-loss mask + normalizer (reference ``lossMultSum``,
    Program.cs:64). With ``axis_name`` (data-parallel shard_map) the
    normalizer is the GLOBAL sum over the whole batch — the pmean'd sum
    equals global_sum/n_shards, so the caller's subsequent pmean over
    losses/grads reproduces the single-device result exactly even with
    non-uniform loss_mult (Multicam's 4^s area weights)."""
    mask = loss_mult[..., 0]
    if cfg.disable_multiscale_loss:
        mask = jnp.ones_like(mask)
    local_sum = jnp.sum(mask)
    if axis_name is not None:
        local_sum = jax.lax.pmean(local_sum, axis_name)
    return mask, jnp.maximum(local_sum, 1e-10)


def level_weight(cfg: Config, i_level: int) -> float:
    """Loss weight of one level: coarse_loss_mult below the fine level
    (Program.cs:81)."""
    return 1.0 if i_level == cfg.num_levels - 1 else cfg.coarse_loss_mult


def total_from_level_losses(cfg: Config, losses: jnp.ndarray):
    """Total loss from stacked per-level MSEs (Program.cs:81)."""
    return cfg.coarse_loss_mult * jnp.sum(losses[:-1]) + losses[-1]


def render_rays(
    params: mlp_lib.Params,
    cfg: Config,
    key: jax.Array,
    rays: Rays,
    randomized: bool,
    white_bkgd: bool,
    mlp_apply=None,
    inference: bool = False,
) -> List[render.RenderResult]:
    """Full hierarchical forward; one RenderResult per level.

    Args:
      rays: leaves [R, C].
      mlp_apply: optional override of the MLP forward (the Pallas fused
        kernel plugs in here); signature (params, cfg, x, dir_enc) ->
        (raw_rgb, raw_density).
      inference: render-only call (never differentiated). On the Pallas
        path each level then runs as ONE fused kernel
        (``fused_level_render``: MLP + activations + compositing), the
        eval counterpart of the fused training kernel.
    """
    dt = _compute_dtype(cfg)
    fused_kernel = False
    fused_render = None
    if mlp_apply is None and inference and cfg.use_pallas and cfg.fuse_level:
        if (cfg.num_rgb_channels == 3 and cfg.num_density_channels == 1
                and (not cfg.fuse_ipe or cfg.diag_covariance)):
            from nerf_or_nothing_tpu.kernels.fused_level import (
                fused_level_render,
            )

            fused_render = fused_level_render
    if mlp_apply is None:
        if cfg.use_pallas:
            from nerf_or_nothing_tpu.kernels.fused_mlp import fused_mlp_apply

            mlp_apply = fused_mlp_apply
            fused_kernel = True
        else:
            def mlp_apply(p, c, x, d):
                return mlp_lib.apply_mlp(p, c, x, d, compute_dtype=dt)

    dir_enc = encode_dirs(cfg, rays)

    results: List[render.RenderResult] = []
    t_vals = None
    weights = None
    for i_level in range(cfg.num_levels):
        key, level_key = jax.random.split(key)
        t_vals, (means, covs) = sample_level(
            cfg, level_key, rays, i_level, t_vals, weights, randomized,
            stop_grad=cfg.stop_level_grad,
        )

        if fused_render is not None:
            x_enc, means_covs = encode_samples(
                cfg, means, covs, in_kernel=True, dtype=dt, render=True
            )
            comp_rgb, acc, weights = fused_render(
                params, cfg, x_enc, dir_enc, t_vals, rays.directions,
                white_bkgd, means_covs=means_covs,
            )
            mids = 0.5 * (t_vals[..., :-1] + t_vals[..., 1:])
            distance = jnp.clip(
                jnp.sum(weights * mids, axis=-1) / jnp.maximum(acc, 1e-10),
                t_vals[..., 0],
                t_vals[..., -1],
            )
            results.append(
                render.RenderResult(comp_rgb, distance, acc, weights)
            )
            continue
        # Pallas path: cast inside the encode fusion (the kernel wrapper
        # would cast anyway; this keeps the HBM copy bf16).
        x_enc, _ = encode_samples(
            cfg, means, covs, in_kernel=False,
            dtype=dt if fused_kernel else None,
        )
        kwargs = {}
        if fused_kernel:
            # dX/dD cotangents can only reach params through the
            # resampling chain of a later level; statically elide them
            # whenever that path cannot exist (level 0's sampling is
            # ray-constant; stop_level_grad cuts it for level > 0).
            kwargs["input_grads"] = (
                i_level > 0 and not cfg.stop_level_grad
            )
        if cfg.remat:
            apply_fn = jax.checkpoint(
                lambda p, x, d: mlp_apply(p, cfg, x, d, **kwargs),
                static_argnums=(),
            )
            raw_rgb, raw_density = apply_fn(params, x_enc, dir_enc)
        else:
            raw_rgb, raw_density = mlp_apply(
                params, cfg, x_enc, dir_enc, **kwargs
            )

        rgb = jax.nn.sigmoid(raw_rgb)
        rgb = rgb * (1.0 + 2.0 * cfg.rgb_padding) - cfg.rgb_padding
        density = jax.nn.softplus(raw_density[..., 0] + cfg.density_bias)

        comp_rgb, acc, weights = render.composite(
            rgb, density, t_vals, rays.directions, white_bkgd
        )
        mids = 0.5 * (t_vals[..., :-1] + t_vals[..., 1:])
        # Safe divide (not nan_to_num): acc underflows to exactly 0 for
        # empty-space rays; generating a NaN and sanitizing it would trip
        # the check_numerics (checkify) mode on benign inputs. acc==0 =>
        # numerator is 0 too => 0, clamped to t0 — identical result.
        distance = jax.lax.stop_gradient(
            jnp.clip(
                jnp.sum(weights * mids, axis=-1) / jnp.maximum(acc, 1e-10),
                t_vals[..., 0],
                t_vals[..., -1],
            )
        )
        results.append(render.RenderResult(comp_rgb, distance, acc, weights))
    return results


def multiscale_loss(
    results: List[render.RenderResult],
    pixels: jnp.ndarray,
    loss_mult: jnp.ndarray,
    cfg: Config,
    axis_name=None,
):
    """Masked multiscale MSE (the unused-but-correct LossFn overload,
    Program.cs:66-89): per-level lossMult-weighted MSE normalized by
    sum(lossMult); coarse levels scaled by coarse_loss_mult (0.1), fine
    level by 1 (Program.cs:81).

    When ``axis_name`` is set (data-parallel shard_map), the normalizer is
    the GLOBAL sum(lossMult) over the whole batch — reference semantics
    (``lossMultSum`` is computed over the full batch, Program.cs:64) — not
    the shard-local sum. The pmean'd denominator equals global_sum/n_shards,
    so the caller's subsequent pmean over losses/grads reproduces the
    single-device result exactly even with non-uniform loss_mult (Multicam's
    4^s area weights).

    Args:
      pixels: [R, 3]; loss_mult: [R, 1].
    Returns:
      (total_loss, per_level_mses).
    """
    mask, denom = loss_normalizer(cfg, loss_mult, axis_name=axis_name)
    losses = []
    for res in results:
        sq = jnp.sum((res.rgb - pixels) ** 2, axis=-1)
        losses.append(jnp.sum(mask * sq) / denom)
    losses = jnp.stack(losses)
    return total_from_level_losses(cfg, losses), losses
