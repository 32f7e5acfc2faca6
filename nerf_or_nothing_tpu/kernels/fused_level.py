"""Whole-level training as ONE Pallas TPU kernel: MLP forward, activations,
alpha compositing, loss gradient, compositing backward, and MLP backward —
all per row tile, with every intermediate resident in VMEM.

Why this exists (the perf argument): with ``stop_level_grad`` (the reference
default, MipNerfModel.cs:13) the per-level losses have INDEPENDENT gradients
— level 1's sampling reads level 0's weights through a stop-gradient, so
dL/dparams = sum over levels of that level's own loss gradient. Each level's
entire fwd+bwd is therefore self-contained given its sampled Gaussians, and
can run as one kernel:

- the backward no longer recomputes the forward (the separate bwd kernel is
  flash-style: it re-runs the 13-matmul forward per tile because residuals
  for a whole level would be ~1 GB of HBM traffic). Here the forward's
  activations are still in VMEM when the backward starts: per-level FLOPs
  drop from 4x forward to 3x.
- the XLA-level composite forward, loss gradient, composite backward, and
  the two activation VJPs (sigmoid/rgb-padding, softplus/density-bias) —
  ~0.7 ms of HBM-bound elementwise work per step — fold into the kernel's
  epilogue as tiny [rays_per_tile, S] VPU ops between the MXU passes.

This subsumes the reference CUDA pipeline's per-level kernel sequence
(``accelerated_functions.cu``: encode -> 12 MLP launches -> compositing
:318-344 -> loss-grad :347-361 -> compositing-grad :362-402 -> 12 backward
launches, each separated by a cudaDeviceSynchronize) into a single launch.

Compositing math (exact reference semantics, MipHelpers.cs:472-610):
  alpha_i = 1 - exp(-sigma_i * delta_i),  delta_i = (t_{i+1}-t_i)*||d||
  T_i = exp(-sum_{j<i} sigma_j delta_j)   (exclusive product scan)
  w_i = alpha_i T_i;  rgb = sum w_i c_i (+ (1-acc) white background)
The scans run as [RT, S] @ [S, S] triangular-ones matmuls on the MXU (an
associative scan over 128 samples is one tiny matmul; no cumsum lowering,
no sequential per-thread loop like the CUDA kernel's :326-336).

The loss gradient is folded in as a per-ray scale: the caller passes
``g_scale[r] = level_weight * 2 * mask_r / sum(mask)`` and the kernel forms
dL/d(comp_rgb) = g_scale * (comp_rgb - pixel) directly (Program.cs:66-89 /
get_output_gradient, accelerated_functions.cu:347-361).

Numerics gate: ``tests/test_kernels_level.py`` asserts the produced
gradients match jax.grad of the unfused oracle step.
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
    DEFAULT_INTERLEAVE_BWD,
    _backward_chunks,
    _forward_chunks,
    _interpret,
    _make_acc,
    _pad_rows,
    _split_rows,
    _weight_specs,
)
from nerf_or_nothing_tpu.models.mlp import Params, layer_dims

# The single kernel holds fwd activations + bwd chain + dW accumulators in
# VMEM, so the row tile sits at the bwd kernel's size (v5e sweep).
DEFAULT_TILE_LEVEL = 2048


def _tri_scan_mats(s: int):
    """Triangular ones matrices for in-kernel scans over the sample axis.

    incl[j, i] = 1 if j <= i  (inclusive prefix-sum:  x @ incl)
    excl[j, i] = 1 if j <  i  (exclusive prefix-sum:  x @ excl)
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    incl = (row <= col).astype(jnp.float32)
    excl = (row < col).astype(jnp.float32)
    return incl, excl


def _scan_mm(x, m):
    """[RT, S] @ [S, S] in f32 on the MXU (scan precision matters: the
    transmittance exponent accumulates up to S=128 terms)."""
    return jax.lax.dot_general(
        x, m, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _composite_fwd_chunk(cfg: Config, white_bkgd: bool, s: int, raw_rgb,
                         raw_den, delta):
    """Activation + compositing forward for one row chunk.

    Returns (comp [RT,3], acc [RT,1], weights [RT,S]) plus the
    intermediates the backward reuses (sig, sp_in, alpha, trans, rgb_rs,
    incl scan matrix)."""
    rt = delta.shape[0]
    p = cfg.rgb_padding

    sig = jax.nn.sigmoid(raw_rgb)                       # [Tc, 3]
    rgb = sig * (1.0 + 2.0 * p) - p
    sp_in = raw_den + cfg.density_bias                  # [Tc, 1]
    sigma = jax.nn.softplus(sp_in)

    sigma_rs = sigma.reshape(rt, s)                     # [RT, S]
    s_ = sigma_rs * delta
    alpha = 1.0 - jnp.exp(-s_)
    incl, excl = _tri_scan_mats(s)
    trans = jnp.exp(-_scan_mm(s_, excl))                # exclusive scan
    weights = alpha * trans                             # [RT, S]
    acc_out = jnp.sum(weights, axis=-1, keepdims=True)  # [RT, 1]

    rgb_rs = rgb.reshape(rt, s, 3)
    comp = jnp.sum(weights[..., None] * rgb_rs, axis=1)  # [RT, 3]
    if white_bkgd:
        comp = comp + (1.0 - acc_out)
    return comp, acc_out, weights, (sig, sp_in, alpha, trans, rgb_rs, incl)


def _composite_chunk(cfg: Config, white_bkgd: bool, s: int, raw_rgb, raw_den,
                     delta, pix, gsc):
    """Forward composite + loss gradient + composite/activation backward for
    one row chunk (whole rays: chunk rows = rays * s).

    Args:
      raw_rgb [Tc, 3] f32, raw_den [Tc, 1] f32 (MLP head outputs);
      delta [RTc, S] f32 precomputed (t_{i+1}-t_i)*||d||; pix [RTc, 3];
      gsc [RTc, 1] per-ray loss-grad scale.
    Returns:
      comp [RTc, 3], acc_out [RTc, 1], weights [RTc, S],
      g_rgb [Tc, 3], g_den [Tc, 1] (cotangents for the MLP heads).
    """
    p = cfg.rgb_padding
    comp, acc_out, weights, saved = _composite_fwd_chunk(
        cfg, white_bkgd, s, raw_rgb, raw_den, delta
    )
    sig, sp_in, alpha, trans, rgb_rs, incl = saved

    # Loss gradient (get_output_gradient semantics): dL/dcomp.
    g_comp = gsc * (comp - pix)                          # [RT, 3]

    # Composite backward (MipHelpers.cs:517-610 / ops.render._composite_bwd,
    # with the reverse recurrence telescoped into a suffix sum).
    dl_dc = g_comp[:, None, :] * weights[..., None]      # [RT, S, 3]
    dl_dw = jnp.sum(g_comp[:, None, :] * rgb_rs, axis=-1)  # [RT, S]
    if white_bkgd:
        dl_dw = dl_dw - jnp.sum(g_comp, axis=-1, keepdims=True)
    wdw = dl_dw * weights
    # suffix_i = sum_{j>i} wdw_j = total - inclusive prefix
    suffix = (
        jnp.sum(wdw, axis=-1, keepdims=True) - _scan_mm(wdw, incl)
    )
    one_minus_alpha = jnp.maximum(1.0 - alpha, 1e-10)
    dl_dalpha = dl_dw * trans - suffix / one_minus_alpha
    dl_dsigma = dl_dalpha * (1.0 - alpha) * delta        # [RT, S]

    # Activation VJPs: rgb = sigmoid*(1+2p)-p; sigma = softplus(raw + bias).
    g_rgb = dl_dc.reshape(-1, 3) * (sig * (1.0 - sig)) * (1.0 + 2.0 * p)
    g_den = dl_dsigma.reshape(-1, 1) * jax.nn.sigmoid(sp_in)
    return comp, acc_out, weights, g_rgb, g_den


import os as _os
_VARIANT = _os.environ.get("FL_VARIANT", "")  # TEMP: ablation timing
_TILE_OVERRIDE = int(_os.environ.get("FL_TILE", "0"))   # TEMP: sweep
_IL_OVERRIDE = int(_os.environ.get("FL_IL", "0"))       # TEMP: sweep


def _level_kernel(cfg: Config, dt, s: int, white_bkgd: bool, interleave: int,
                  *refs):
    n_layers = len(layer_dims(cfg))
    x_ref, d_ref, delta_ref, pix_ref, gsc_ref = refs[:5]
    w_refs = refs[5 : 5 + n_layers]
    b_refs = refs[5 + n_layers : 5 + 2 * n_layers]
    out = refs[5 + 2 * n_layers :]
    dw_refs = out[:n_layers]
    db_refs = out[n_layers : 2 * n_layers]
    comp_ref, acc_ref, wts_ref = out[2 * n_layers : 2 * n_layers + 3]

    ws = [w[...] for w in w_refs]
    bs = [b[...] for b in b_refs]
    # x arrives TRANSPOSED ([F, tile], feature-major) — the layout XLA's
    # IPE fusion produces natively; chunks split along the row (lane) axis.
    x_t = x_ref[...]
    chunk = x_t.shape[1] // interleave
    xs = [x_t[:, i * chunk : (i + 1) * chunk] for i in range(interleave)]
    ds = _split_rows(d_ref[...], interleave)

    # ---- forward: activations stay live for the backward ----
    raw_rgbs, raw_dens, hs, vs = _forward_chunks(
        cfg, dt, s, xs, ds, ws, bs, x_t=True
    )

    # ---- composite + loss grad + composite bwd, per chunk ----
    deltas = _split_rows(delta_ref[...], interleave)
    pixs = _split_rows(pix_ref[...], interleave)
    gscs = _split_rows(gsc_ref[...], interleave)
    comps, accs, wtss, g_rgbs, g_dens = [], [], [], [], []
    for c in range(len(xs)):
        if _VARIANT == "nocomposite":  # TEMP ablation: dummy cotangents
            rt = deltas[c].shape[0]
            comp = raw_rgbs[c].reshape(rt, s, 3)[:, 0, :]
            acc_out = raw_dens[c].reshape(rt, s)[:, :1]
            wts = deltas[c]
            g_rgb = raw_rgbs[c] * 1e-3
            g_den = raw_dens[c] * 1e-3
        else:
            comp, acc_out, wts, g_rgb, g_den = _composite_chunk(
                cfg, white_bkgd, s, raw_rgbs[c], raw_dens[c], deltas[c],
                pixs[c], gscs[c],
            )
        comps.append(comp)
        accs.append(acc_out)
        wtss.append(wts)
        g_rgbs.append(g_rgb)
        g_dens.append(g_den)

    # ---- MLP backward reusing the live activations (no recompute) ----
    if _VARIANT == "nobwd":  # TEMP ablation: skip the MLP backward
        for r in list(dw_refs) + list(db_refs):
            r[...] = jnp.zeros(r.shape, r.dtype) + g_rgbs[0][0, 0]
    else:
        _backward_chunks(
            cfg, dt, s, xs, ds, ws, bs, g_rgbs, g_dens,
            _make_acc(), dw_refs, db_refs,
            want_dx=False, want_dd=False, acts=(hs, vs), x_t=True,
        )

    comp_ref[...] = jnp.concatenate(comps, axis=0)
    acc_ref[...] = jnp.concatenate(accs, axis=0)
    wts_ref[...] = jnp.concatenate(wtss, axis=0)


def _render_kernel(cfg: Config, dt, s: int, white_bkgd: bool,
                   interleave: int, *refs):
    """Forward-only whole level: MLP + activations + compositing, one
    launch (the render/eval counterpart of ``_level_kernel``)."""
    n_layers = len(layer_dims(cfg))
    x_ref, d_ref, delta_ref = refs[:3]
    w_refs = refs[3 : 3 + n_layers]
    b_refs = refs[3 + n_layers : 3 + 2 * n_layers]
    comp_ref, acc_ref, wts_ref = refs[3 + 2 * n_layers :]

    ws = [w[...] for w in w_refs]
    bs = [b[...] for b in b_refs]
    x_t = x_ref[...]
    chunk = x_t.shape[1] // interleave
    xs = [x_t[:, i * chunk : (i + 1) * chunk] for i in range(interleave)]
    ds = _split_rows(d_ref[...], interleave)

    raw_rgbs, raw_dens, _, _ = _forward_chunks(
        cfg, dt, s, xs, ds, ws, bs, x_t=True
    )
    deltas = _split_rows(delta_ref[...], interleave)
    comps, accs, wtss = [], [], []
    for c in range(len(xs)):
        comp, acc_out, wts, _ = _composite_fwd_chunk(
            cfg, white_bkgd, s, raw_rgbs[c], raw_dens[c], deltas[c]
        )
        comps.append(comp)
        accs.append(acc_out)
        wtss.append(wts)
    comp_ref[...] = jnp.concatenate(comps, axis=0)
    acc_ref[...] = jnp.concatenate(accs, axis=0)
    wts_ref[...] = jnp.concatenate(wtss, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "tile", "s", "white_bkgd", "interleave"),
)
def _fused_render_impl(params, x_t, d, delta, *, cfg: Config, tile: int,
                       s: int, white_bkgd: bool, interleave: int):
    feat, n = x_t.shape
    num_rays = n // s
    dims, w_specs, b_specs = _weight_specs(cfg)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    pad = (-n) % tile
    xp = (
        jnp.concatenate(
            [x_t, jnp.zeros((feat, pad), x_t.dtype)], axis=1
        ) if pad else x_t
    )
    rays_tile = tile // s
    dp = _pad_rows(d, rays_tile)
    deltap = _pad_rows(delta, rays_tile)
    n_pad = xp.shape[1]
    r_pad = n_pad // s
    grid = (n_pad // tile,)

    def ray_spec(cols):
        return pl.BlockSpec((rays_tile, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((feat, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        ray_spec(d.shape[1]),
        ray_spec(s),
        *w_specs,
        *b_specs,
    ]
    out_specs = [ray_spec(3), ray_spec(1), ray_spec(s)]
    out_shape = [
        jax.ShapeDtypeStruct((r_pad, 3), jnp.float32),
        jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((r_pad, s), jnp.float32),
    ]
    flops_rows = 2 * sum(i * o for i, o in dims)
    comp, acc_out, weights = pl.pallas_call(
        functools.partial(_render_kernel, cfg, dt, s, white_bkgd,
                          interleave),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_rows * n_pad,
            bytes_accessed=n_pad * (feat + 8) * 2,
            transcendentals=n_pad * 4,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(
        xp, dp, deltap,
        *[w.astype(dt) for w, _ in params],
        *[b.reshape(1, -1) for _, b in params],
    )
    return (
        comp[:num_rays], acc_out[:num_rays, 0], weights[:num_rays]
    )


def fused_level_render(params: Params, cfg: Config, x_enc: jnp.ndarray,
                       dir_enc: jnp.ndarray, t_vals: jnp.ndarray,
                       dirs: jnp.ndarray, white_bkgd: bool,
                       tile: int | None = None):
    """One level's full RENDER pass (MLP + activations + compositing) as a
    single kernel — the eval/serving counterpart of ``fused_level_train``.

    Subsumes the reference render sequence (MLP launches + the
    ``volumetric_rendering`` kernel, accelerated_functions.cu:318-344) into
    one launch. Returns (comp_rgb [R,3], acc [R], weights [R,S]); no
    gradients, so it is valid for any config (no stop_level_grad proviso).
    """
    num_rays, s, feat = x_enc.shape
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    x2d = x_enc.reshape(num_rays * s, feat).T.astype(dt)
    d2d = dir_enc.reshape(num_rays, dir_enc.shape[-1]).astype(dt)
    d_norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    delta = ((t_vals[..., 1:] - t_vals[..., :-1]) * d_norm).astype(
        jnp.float32
    )
    tile = tile or _TILE_OVERRIDE or DEFAULT_TILE_LEVEL
    if tile % s:
        tile = ((tile + s - 1) // s) * s

    def pick_interleave(default, t):
        il = default
        while il > 1 and (t % il or (t // il) % s):
            il //= 2
        return il

    interleave = pick_interleave(
        _IL_OVERRIDE or DEFAULT_INTERLEAVE_BWD, tile
    )
    return _fused_render_impl(
        params, x2d, d2d, delta, cfg=cfg, tile=tile, s=s,
        white_bkgd=white_bkgd, interleave=interleave,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "tile", "s", "white_bkgd", "interleave"),
)
def _fused_level_impl(params, x_t, d, delta, pixels, g_scale, *,
                      cfg: Config, tile: int, s: int, white_bkgd: bool,
                      interleave: int):
    # x_t: the [F, N] TRANSPOSED feature tensor (see _level_kernel).
    feat, n = x_t.shape
    num_rays = n // s
    dims, w_specs, b_specs = _weight_specs(cfg)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    pad = (-n) % tile
    xp = (
        jnp.concatenate(
            [x_t, jnp.zeros((feat, pad), x_t.dtype)], axis=1
        ) if pad else x_t
    )
    rays_tile = tile // s
    dp = _pad_rows(d, rays_tile)
    deltap = _pad_rows(delta, rays_tile)
    pixp = _pad_rows(pixels, rays_tile)
    # Zero g_scale on padded rays: their loss gradient vanishes identically,
    # so padding contributes nothing to dW/db.
    gscp = _pad_rows(g_scale, rays_tile)
    n_pad = xp.shape[1]
    r_pad = n_pad // s
    grid = (n_pad // tile,)

    def ray_spec(cols):
        return pl.BlockSpec((rays_tile, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((feat, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        ray_spec(d.shape[1]),
        ray_spec(s),
        ray_spec(3),
        ray_spec(1),
        *w_specs,
        *b_specs,
    ]
    out_specs = [*w_specs, *b_specs, ray_spec(3), ray_spec(1), ray_spec(s)]
    out_shape = (
        [jax.ShapeDtypeStruct((i, o), jnp.float32) for i, o in dims]
        + [jax.ShapeDtypeStruct((1, o), jnp.float32) for _, o in dims]
        + [
            jax.ShapeDtypeStruct((r_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, s), jnp.float32),
        ]
    )
    flops_rows = 3 * 2 * sum(i * o for i, o in dims)
    outs = pl.pallas_call(
        functools.partial(_level_kernel, cfg, dt, s, white_bkgd, interleave),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_rows * n_pad,
            bytes_accessed=n_pad * (feat + 16) * 4,
            transcendentals=n_pad * 8,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(
        xp, dp, deltap, pixp, gscp,
        *[w.astype(dt) for w, _ in params],
        *[b.reshape(1, -1) for _, b in params],
    )
    n_layers = len(dims)
    dws = outs[:n_layers]
    dbs = [b[0] for b in outs[n_layers : 2 * n_layers]]
    d_params = [(dw, db) for dw, db in zip(dws, dbs)]
    comp = outs[2 * n_layers][:num_rays]
    acc_out = outs[2 * n_layers + 1][:num_rays, 0]
    weights = outs[2 * n_layers + 2][:num_rays]
    return comp, acc_out, weights, d_params


def fused_level_train(params: Params, cfg: Config, x_enc: jnp.ndarray,
                      dir_enc: jnp.ndarray, t_vals: jnp.ndarray,
                      dirs: jnp.ndarray, pixels: jnp.ndarray,
                      g_scale: jnp.ndarray, white_bkgd: bool,
                      tile: int | None = None):
    """One level's full train pass (fwd + loss grad + bwd) in one kernel.

    Args:
      x_enc: [R, S, F] IPE features; dir_enc: [R, Fd]; t_vals: [R, S+1];
      dirs: [R, 3] unnormalized directions (their norm scales delta);
      pixels: [R, 3]; g_scale: [R, 1] per-ray dL/dcomp scale
      (= level_weight * 2 * mask / sum(mask)).
    Returns:
      comp_rgb [R, 3], acc [R], weights [R, S], d_params (list of (dW, db)).

    ONLY valid when the level's loss is independent of other levels'
    parameters' use — i.e. training with stop_level_grad (the sampled
    Gaussians are constants w.r.t. params).
    """
    num_rays, s, feat = x_enc.shape
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    # Transposed features: XLA's IPE fusion computes feature-major (N minor)
    # anyway, so transpose(reshape(...)) fuses into it with NO copy, where
    # the row-major form needed two full-tensor layout copies.
    x2d = x_enc.reshape(num_rays * s, feat).T.astype(dt)
    d2d = dir_enc.reshape(num_rays, dir_enc.shape[-1]).astype(dt)
    d_norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    delta = ((t_vals[..., 1:] - t_vals[..., :-1]) * d_norm).astype(
        jnp.float32
    )
    tile = tile or _TILE_OVERRIDE or DEFAULT_TILE_LEVEL
    if tile % s:
        tile = ((tile + s - 1) // s) * s  # tiles must cover whole rays

    def pick_interleave(default, t):
        il = default
        while il > 1 and (t % il or (t // il) % s):
            il //= 2
        return il

    interleave = pick_interleave(
        _IL_OVERRIDE or DEFAULT_INTERLEAVE_BWD, tile
    )
    return _fused_level_impl(
        params, x2d, d2d, delta, pixels.astype(jnp.float32),
        g_scale.astype(jnp.float32), cfg=cfg, tile=tile, s=s,
        white_bkgd=white_bkgd, interleave=interleave,
    )
