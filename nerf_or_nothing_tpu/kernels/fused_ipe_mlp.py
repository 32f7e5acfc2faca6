"""Fully fused encode+MLP: IPE computed inside the Pallas kernel.

One step further than ``fused_mlp``: the kernel takes the frustum Gaussians
(means + diagonal covariances, 6 floats per sample) and computes the
integrated positional encoding (MipHelpers.cs:429-471 /
accelerated_functions.cu's ``encode_input_data``) in VMEM, feeding the MLP
without ever materializing the [rays*samples, 96] feature tensor in HBM —
the reference's encode kernel writes ~50 MB of encodings to global memory
per level per step; the unfused XLA path does the same.

Feature layout trick: in-kernel the features are block-ordered
``[sin(2^f mu)... | cos(2^f mu)...]`` (cheap to build with concatenations)
instead of the model's canonical per-frequency ``[sin(3), cos(3)]``
interleave; the layer-0 and skip-layer weight rows are permuted to match
OUTSIDE the kernel (a [96, 256] gather per call), and the resulting dW rows
are permuted back. Numerics are identical.

Gradients: the encoded-position inputs are upstream of nothing trainable
(t_vals are stop-gradient'd between levels — StopLevelGrad,
MipNerfModel.cs:13 — and rays are data), so the custom VJP returns zero
cotangents for means/covs and skips the dX matmuls entirely. The
per-ray direction gradient is still exact.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_or_nothing_tpu.config import Config
from nerf_or_nothing_tpu.kernels.fused_mlp import (
    DEFAULT_TILE_BWD,
    DEFAULT_TILE_FWD,
    _backward_tile,
    _forward_tile,
    _interpret,
    _make_acc,
    _pad_rows,
    _weight_specs,
)
from nerf_or_nothing_tpu.models.mlp import Params, layer_dims


def _feature_perm(cfg: Config) -> np.ndarray:
    """perm[k] = canonical feature index of kernel feature k.

    kernel order: [sin f0(3), sin f1(3), ..., cos f0(3), ...]
    canonical:    [sin f0(3), cos f0(3), sin f1(3), cos f1(3), ...]
    """
    nf = cfg.max_deg_point - cfg.min_deg_point
    perm = np.empty(6 * nf, dtype=np.int64)
    for k in range(6 * nf):
        sc = k // (3 * nf)
        r = k % (3 * nf)
        f, c = r // 3, r % 3
        perm[k] = 6 * f + 3 * sc + c
    return perm


def _permute_params(params: Params, cfg: Config) -> Params:
    """Row-permute layer-0 (and skip-layer bottom) weights to kernel order."""
    perm = _feature_perm(cfg)
    nw = cfg.net_width
    out = list(params)
    w0, b0 = out[0]
    out[0] = (w0[perm, :], b0)
    for i in range(1, cfg.net_depth):
        if i % cfg.skip_layer == 0:
            w, b = out[i]
            out[i] = (jnp.concatenate([w[:nw], w[nw:][perm, :]]), b)
    return out


def _unpermute_dparams(d_params, cfg: Config):
    """Inverse of _permute_params on weight gradients."""
    perm = _feature_perm(cfg)
    inv = np.argsort(perm)
    nw = cfg.net_width
    out = list(d_params)
    dw0, db0 = out[0]
    out[0] = (dw0[inv, :], db0)
    for i in range(1, cfg.net_depth):
        if i % cfg.skip_layer == 0:
            dw, db = out[i]
            out[i] = (jnp.concatenate([dw[:nw], dw[nw:][inv, :]]), db)
    return out


def _ipe_tile(cfg: Config, means, covs):
    """IPE features (block layout) for one tile, in VMEM.

    E[sin(2^f x)] = exp(-4^f var/2) sin(2^f mu); cos likewise
    (MipHelpers.cs:358-366, 429-471). Returns [tile, 6*num_freqs] f32.
    """
    scales = [2.0 ** (cfg.min_deg_point + f)
              for f in range(cfg.max_deg_point - cfg.min_deg_point)]
    y = jnp.concatenate([means * s for s in scales], axis=-1)
    v = jnp.concatenate([covs * (s * s) for s in scales], axis=-1)
    amp = jnp.exp(-0.5 * v)
    return jnp.concatenate([amp * jnp.sin(y), amp * jnp.cos(y)], axis=-1)


def _fwd_kernel(cfg: Config, dt, s: int, *refs):
    n_layers = len(layer_dims(cfg))
    m_ref, c_ref, d_ref = refs[:3]
    w_refs = refs[3 : 3 + n_layers]
    b_refs = refs[3 + n_layers : 3 + 2 * n_layers]
    rgb_ref, den_ref = refs[3 + 2 * n_layers], refs[4 + 2 * n_layers]

    x = _ipe_tile(cfg, m_ref[...], c_ref[...])
    raw_rgb, raw_density, _, _ = _forward_tile(
        cfg, dt, s, x, d_ref[...],
        [w[...] for w in w_refs], [b[...] for b in b_refs],
    )
    rgb_ref[...] = raw_rgb
    den_ref[...] = raw_density


def _bwd_kernel(cfg: Config, dt, s: int, *refs):
    n_layers = len(layer_dims(cfg))
    m_ref, c_ref, d_ref, grgb_ref, gden_ref = refs[:5]
    w_refs = refs[5 : 5 + n_layers]
    b_refs = refs[5 + n_layers : 5 + 2 * n_layers]
    out = refs[5 + 2 * n_layers :]
    dw_refs = out[:n_layers]
    db_refs = out[n_layers : 2 * n_layers]
    dd_ref = out[2 * n_layers]

    x = _ipe_tile(cfg, m_ref[...], c_ref[...])
    _, g_d = _backward_tile(
        cfg, dt, s, x, d_ref[...],
        [w[...] for w in w_refs], [b[...] for b in b_refs],
        grgb_ref[...], gden_ref[...], _make_acc(), dw_refs, db_refs,
        want_dx=False,
    )
    dd_ref[...] = g_d


def _row_spec(tile, width):
    return pl.BlockSpec((tile, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "s"))
def _fwd_impl(params, means, covs, d, *, cfg: Config, tile: int, s: int):
    n = means.shape[0]
    dims, w_specs, b_specs = _weight_specs(cfg)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    kparams = _permute_params(params, cfg)

    mp = _pad_rows(means, tile)
    cp = _pad_rows(covs, tile)
    dp = _pad_rows(d, tile // s)
    n_pad = mp.shape[0]

    flops_rows = 2 * sum(i * o for i, o in dims)
    raw_rgb, raw_den = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg, dt, s),
        grid=(n_pad // tile,),
        in_specs=[
            _row_spec(tile, 3), _row_spec(tile, 3),
            _row_spec(tile // s, d.shape[1]),
            *w_specs, *b_specs,
        ],
        out_specs=[
            _row_spec(tile, cfg.num_rgb_channels),
            _row_spec(tile, cfg.num_density_channels),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, cfg.num_rgb_channels), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, cfg.num_density_channels),
                                 jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_rows * n_pad,
            bytes_accessed=n_pad * 10 * 4,
            transcendentals=n_pad * cfg.location_features,
        ),
        interpret=_interpret(),
    )(
        mp, cp, dp,
        *[w.astype(dt) for w, _ in kparams],
        *[b.reshape(1, -1) for _, b in kparams],
    )
    return raw_rgb[:n], raw_den[:n]


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "s"))
def _bwd_impl(params, means, covs, d, g_rgb, g_den, *, cfg: Config,
              tile: int, s: int):
    n = means.shape[0]
    dims, w_specs, b_specs = _weight_specs(cfg)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    kparams = _permute_params(params, cfg)

    mp = _pad_rows(means, tile)
    cp = _pad_rows(covs, tile)
    dp = _pad_rows(d, tile // s)
    gp = _pad_rows(g_rgb, tile)
    gdp = _pad_rows(g_den, tile)
    n_pad = mp.shape[0]

    out_shape = (
        [jax.ShapeDtypeStruct((i, o), jnp.float32) for i, o in dims]
        + [jax.ShapeDtypeStruct((1, o), jnp.float32) for _, o in dims]
        + [jax.ShapeDtypeStruct((n_pad // s, d.shape[1]), jnp.float32)]
    )
    flops_rows = 3 * 2 * sum(i * o for i, o in dims)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg, dt, s),
        grid=(n_pad // tile,),
        in_specs=[
            _row_spec(tile, 3), _row_spec(tile, 3),
            _row_spec(tile // s, d.shape[1]),
            _row_spec(tile, g_rgb.shape[1]),
            _row_spec(tile, g_den.shape[1]),
            *w_specs, *b_specs,
        ],
        out_specs=[*w_specs, *b_specs,
                   _row_spec(tile // s, d.shape[1])],
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_rows * n_pad,
            bytes_accessed=n_pad * 14 * 4,
            transcendentals=n_pad * cfg.location_features,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(
        mp, cp, dp, gp, gdp,
        *[w.astype(dt) for w, _ in kparams],
        *[b.reshape(1, -1) for _, b in kparams],
    )
    n_layers = len(dims)
    dws = outs[:n_layers]
    dbs = [b[0] for b in outs[n_layers : 2 * n_layers]]
    dd = outs[2 * n_layers][: n // s]
    d_params = _unpermute_dparams(
        [(dw, db) for dw, db in zip(dws, dbs)], cfg
    )
    return d_params, dd


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_ipe_apply(params, means2d, covs2d, d2d, cfg: Config,
                     tile_fwd: int, tile_bwd: int, s: int):
    return _fwd_impl(params, means2d, covs2d, d2d, cfg=cfg, tile=tile_fwd,
                     s=s)


def _fused_ipe_apply_fwd(params, means2d, covs2d, d2d, cfg, tile_fwd,
                         tile_bwd, s):
    out = _fwd_impl(params, means2d, covs2d, d2d, cfg=cfg, tile=tile_fwd,
                    s=s)
    return out, (params, means2d, covs2d, d2d)


def _fused_ipe_apply_bwd(cfg, tile_fwd, tile_bwd, s, res, grads):
    params, means2d, covs2d, d2d = res
    g_rgb, g_den = grads
    d_params, dd = _bwd_impl(
        params, means2d, covs2d, d2d, g_rgb, g_den, cfg=cfg, tile=tile_bwd,
        s=s,
    )
    # means/covs are non-differentiable by design (stop-gradient upstream);
    # see module docstring.
    return d_params, jnp.zeros_like(means2d), jnp.zeros_like(covs2d), dd


_fused_ipe_apply.defvjp(_fused_ipe_apply_fwd, _fused_ipe_apply_bwd)


def fused_ipe_mlp_apply(
    params: Params,
    cfg: Config,
    means: jnp.ndarray,
    covs: jnp.ndarray,
    dir_enc: jnp.ndarray,
    tile: int | None = None,
    tile_bwd: int | None = None,
):
    """Encode+MLP in one kernel.

    Args:
      means/covs: [..., S, 3] diagonal frustum Gaussians from ``cast_rays``.
      dir_enc: [..., direction_features] per ray.
    Returns:
      raw_rgb [..., S, 3], raw_density [..., S, 1].
    """
    lead = means.shape[:-1]
    n = int(np.prod(lead))
    num_samples = means.shape[-2]
    num_rays = n // num_samples
    m2d = means.reshape(n, 3)
    c2d = covs.reshape(n, 3)
    tile_fwd = tile or DEFAULT_TILE_FWD
    tile_bwd = tile_bwd or tile or DEFAULT_TILE_BWD
    if tile_fwd % num_samples == 0 and tile_bwd % num_samples == 0:
        s = num_samples
        d2d = dir_enc.reshape(num_rays, dir_enc.shape[-1])
    else:
        s = 1
        d2d = jnp.broadcast_to(
            dir_enc[..., None, :], (*lead, dir_enc.shape[-1])
        ).reshape(n, dir_enc.shape[-1])
    raw_rgb, raw_den = _fused_ipe_apply(
        params, m2d, c2d, d2d, cfg, tile_fwd, tile_bwd, s
    )
    return (
        raw_rgb.reshape(*lead, cfg.num_rgb_channels),
        raw_den.reshape(*lead, cfg.num_density_channels),
    )
