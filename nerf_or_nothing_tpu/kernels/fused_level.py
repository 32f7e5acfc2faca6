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
    _mm,
    _mm_tn,
    _pad_rows,
    _split_rows,
    _weight_specs,
)
from nerf_or_nothing_tpu.models.mlp import Params, layer_dims

# The single kernel holds fwd activations + bwd chain + dW accumulators in
# VMEM, so the row tile sits at the bwd kernel's size (v5e sweep).
DEFAULT_TILE_LEVEL = 2048
# The RENDER kernel is forward-only — no dW accumulators, no gradient
# chain, activations die layer-by-layer — so it runs bigger tiles with
# more independent chunks in flight (v5e sweep, round 5; probes
# fr_tile / fr_il override).
DEFAULT_TILE_RENDER = 4096
DEFAULT_INTERLEAVE_RENDER = 4


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


def _composite_fwd_planes(cfg: Config, white_bkgd: bool, s: int, raw_rgb_t,
                          raw_den_t, delta):
    """Activation + compositing forward in CHANNEL-PLANE form.

    ``raw_rgb_t`` [3, RT*S] / ``raw_den_t`` [1, RT*S] are the TRANSPOSED
    head outputs (fused_mlp._forward_chunks heads_t_out): each channel row
    reshapes contiguously to a full-lane [RT, S] plane, so every
    elementwise op here runs at 128/128 lane occupancy — the row-major
    composite's [., 3] channel-minor tensors ran at 3/128 and measured
    0.28 ms/level (fl_variant=nocomp attribution, docs/PERF.md round 4).
    """
    rt = delta.shape[0]
    p = cfg.rgb_padding

    sig_p = [
        jax.nn.sigmoid(raw_rgb_t[k : k + 1, :].reshape(rt, s))
        for k in range(3)
    ]
    rgb_p = [sg * (1.0 + 2.0 * p) - p for sg in sig_p]
    sp_in = raw_den_t.reshape(rt, s) + cfg.density_bias
    sigma_rs = jax.nn.softplus(sp_in)

    s_ = sigma_rs * delta
    alpha = 1.0 - jnp.exp(-s_)
    incl, excl = _tri_scan_mats(s)
    trans = jnp.exp(-_scan_mm(s_, excl))
    weights = alpha * trans
    acc_out = jnp.sum(weights, axis=-1, keepdims=True)

    comp = jnp.concatenate(
        [jnp.sum(weights * rgb_p[k], axis=-1, keepdims=True)
         for k in range(3)],
        axis=1,
    )  # [RT, 3]
    if white_bkgd:
        comp = comp + (1.0 - acc_out)
    return comp, acc_out, weights, (sig_p, rgb_p, sp_in, alpha, trans, incl)


def _composite_planes(cfg: Config, white_bkgd: bool, s: int, raw_rgb_t,
                      raw_den_t, delta, pix, gsc):
    """Forward composite + loss gradient + composite/activation backward,
    channel-plane form (same math as ``_composite_chunk``, full-lane ops).

    Returns the head cotangents TRANSPOSED — g_rgb_t [3, RT*S],
    g_den_t [1, RT*S] — for the transposed head backward
    (fused_mlp._backward_chunks heads_gt)."""
    rt = delta.shape[0]
    p = cfg.rgb_padding
    comp, acc_out, weights, saved = _composite_fwd_planes(
        cfg, white_bkgd, s, raw_rgb_t, raw_den_t, delta
    )
    sig_p, rgb_p, sp_in, alpha, trans, incl = saved

    g_comp = gsc * (comp - pix)                          # [RT, 3]
    gck = [g_comp[:, k : k + 1] for k in range(3)]       # [RT, 1] each
    dl_dw = sum(gck[k] * rgb_p[k] for k in range(3))     # [RT, S]
    if white_bkgd:
        dl_dw = dl_dw - (gck[0] + gck[1] + gck[2])
    wdw = dl_dw * weights
    suffix = (
        jnp.sum(wdw, axis=-1, keepdims=True) - _scan_mm(wdw, incl)
    )
    one_minus_alpha = jnp.maximum(1.0 - alpha, 1e-10)
    dl_dalpha = dl_dw * trans - suffix / one_minus_alpha
    dl_dsigma = dl_dalpha * (1.0 - alpha) * delta        # [RT, S]

    g_rgb_t = jnp.concatenate(
        [
            ((gck[k] * weights)
             * (sig_p[k] * (1.0 - sig_p[k]) * (1.0 + 2.0 * p))
             ).reshape(1, rt * s)
            for k in range(3)
        ],
        axis=0,
    )  # [3, RT*S]
    g_den_t = (dl_dsigma * jax.nn.sigmoid(sp_in)).reshape(1, rt * s)
    return comp, acc_out, weights, g_rgb_t, g_den_t


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


# Perf-attribution hooks (cfg.kernel_probes, set only by
# benchmarks/profile_step.py --probes): fl_variant=nobwd skips the MLP
# backward; fl_tile / fl_il override the row tile / interleave for sweeps.
# Read through cfg so every probe is part of the jit/pallas cache key.


def _ipe_perm(cfg: Config):
    """Row permutation mapping the in-kernel IPE's [all-sin | all-cos]
    feature order back to the reference interleaved [sin3, cos3]-per-
    frequency order (ops/ipe.integrated_pos_enc layout).

    perm[j] = which interleaved-order row the j-th permuted row is; use it
    to gather weight rows going IN (w_perm = w[perm]) and argsort(perm) to
    scatter dW rows coming OUT."""
    F = cfg.max_deg_point - cfg.min_deg_point
    sin_rows = [6 * i + k for i in range(F) for k in range(3)]
    cos_rows = [6 * i + 3 + k for i in range(F) for k in range(3)]
    perm = np.asarray(sin_rows + cos_rows)
    return perm, np.argsort(perm)


def _encode_chunk(cfg: Config, dt, mT, vT):
    """In-kernel IPE of one transposed chunk: [3, rows] mean/var ->
    ([3F, rows] sin-features, [3F, rows] cos-features), bf16.

    Same math as ops/ipe.integrated_pos_enc (shared exp(-var/2) damping,
    f32 transcendentals — bf16 y would destroy the phase at high
    frequencies), emitted as separate sin/cos halves so the interleaved
    feature tensor never exists: the consuming matmuls use sin-rows-first
    permuted weights (``_ipe_perm``) and a two-part split matmul.

    In the transposed (feature-major) layout the rows axis fills all 128
    lanes, fixing the lane-starvation that made the round-1 row-major
    fused-IPE kernel a loss (Config.fuse_ipe history).
    """
    F = cfg.max_deg_point - cfg.min_deg_point
    # scales[j] = 2^(min_deg + j//3), built in-kernel (pallas_call rejects
    # captured constant arrays).
    row = jax.lax.broadcasted_iota(jnp.int32, (3 * F, 1), 0)
    scales = jnp.exp2(
        (cfg.min_deg_point + row // 3).astype(jnp.float32)
    )  # [3F, 1]
    m = jnp.concatenate([mT] * F, axis=0)  # [3F, rows]
    v = jnp.concatenate([vT] * F, axis=0)
    y = m * scales
    if cfg.fast_ipe:
        # Polynomial transcendentals (ops/fastmath.py): Mosaic's library
        # sin/cos throughput measured ~3x below XLA's encode fusion
        # (docs/PERF.md r3 — the reason in-kernel IPE lost that round);
        # the ~10-FMA kernels sidestep that entirely.
        if cfg.probe("fl_enc") == "sep":
            # probe: independent sin/cos chains (the XLA-fusion winner;
            # in Mosaic the shared reduction is faster — see below)
            from nerf_or_nothing_tpu.ops.fastmath import (
                fast_cos, fast_exp_neg, fast_sin,
            )

            damp = fast_exp_neg(v * 0.5 * (scales * scales))
            s48 = (damp * fast_sin(y)).astype(dt)
            c48 = (damp * fast_cos(y)).astype(dt)
        else:
            # Shared-reduction sincos: the OPPOSITE choice from the XLA
            # encode fusion (ops/ipe.py) — Mosaic schedules the diamond
            # fine and the ~25% fewer VPU ops win: render 484.2k vs
            # 478.7k rays/s on v5e (docs/PERF.md round 5).
            from nerf_or_nothing_tpu.ops.fastmath import (
                fast_exp_neg, fast_sincos,
            )

            damp = fast_exp_neg(v * 0.5 * (scales * scales))
            sin_y, cos_y = fast_sincos(y)
            s48 = (damp * sin_y).astype(dt)
            c48 = (damp * cos_y).astype(dt)
    else:
        damp = jnp.exp(v * (-0.5) * (scales * scales))
        s48 = (damp * jnp.sin(y)).astype(dt)
        c48 = (damp * jnp.cos(y)).astype(dt)
    return s48, c48


def _ipe_weight_layers(cfg: Config):
    """Indices of layers whose weight rows consume the encoded position
    (layer 0 fully; skip-concat layers in their bottom x-row block)."""
    return [0] + [
        i for i in range(1, cfg.net_depth) if i % cfg.skip_layer == 0
    ]


def _permute_ipe_weights(params, cfg: Config):
    """Reorder x-consuming weight rows sin-first for the in-kernel IPE."""
    perm, _ = _ipe_perm(cfg)
    nw = cfg.net_width
    ipe_layers = set(_ipe_weight_layers(cfg))
    out = []
    for i, (w, b) in enumerate(params):
        if i == 0:
            w = w[perm]
        elif i in ipe_layers:
            w = jnp.concatenate([w[:nw], w[nw:][perm]], axis=0)
        out.append((w, b))
    return out


def _unpermute_ipe_dw(d_params, cfg: Config):
    """Scatter in-kernel-IPE dW rows back to the reference row order."""
    _, inv = _ipe_perm(cfg)
    nw = cfg.net_width
    ipe_layers = set(_ipe_weight_layers(cfg))
    out = []
    for i, (dw, db) in enumerate(d_params):
        if i == 0:
            dw = dw[inv]
        elif i in ipe_layers:
            dw = jnp.concatenate([dw[:nw], dw[nw:][inv]], axis=0)
        out.append((dw, db))
    return out


def _level_kernel(cfg: Config, dt, s: int, white_bkgd: bool, interleave: int,
                  x_mode: str, *refs):
    n_layers = len(layer_dims(cfg))
    if x_mode in ("mv", "pair"):
        a_ref, b_ref, d_ref, delta_ref, pix_ref, gsc_ref = refs[:6]
        rest = refs[6:]
    else:
        x_ref, d_ref, delta_ref, pix_ref, gsc_ref = refs[:5]
        rest = refs[5:]
    w_refs = rest[:n_layers]
    b_refs = rest[n_layers : 2 * n_layers]
    out = rest[2 * n_layers :]
    dw_refs = out[:n_layers]
    db_refs = out[n_layers : 2 * n_layers]
    comp_ref, acc_ref, wts_ref = out[2 * n_layers : 2 * n_layers + 3]

    ws = [w[...] for w in w_refs]
    bs = [b[...] for b in b_refs]
    if x_mode == "mv":
        # In-kernel IPE: chunks of transposed [3, rows] sample mean/var ->
        # (sin, cos) feature halves; the [R*S, 96] tensor never exists in
        # HBM and the XLA encode fusion disappears entirely.
        mT, vT = a_ref[...], b_ref[...]
        chunk = mT.shape[1] // interleave
        xs = [
            _encode_chunk(
                cfg, dt,
                mT[:, i * chunk : (i + 1) * chunk],
                vT[:, i * chunk : (i + 1) * chunk],
            )
            for i in range(interleave)
        ]
    elif x_mode == "pair":
        # XLA-encoded TRANSPOSED sin/cos halves ([3F, tile] each,
        # ops.ipe.integrated_pos_enc_split): consumed exactly like the
        # in-kernel-IPE halves (sin-rows-first permuted weights, split
        # matmuls) — the interleaved [N, 96] feature tensor and its
        # [96, N] relayout never exist in HBM.
        s48, c48 = a_ref[...], b_ref[...]
        chunk = s48.shape[1] // interleave
        xs = [
            (s48[:, i * chunk : (i + 1) * chunk],
             c48[:, i * chunk : (i + 1) * chunk])
            for i in range(interleave)
        ]
    else:
        # x arrives TRANSPOSED ([F, tile], feature-major) — the layout
        # XLA's IPE fusion produces natively; chunks split along the row
        # (lane) axis.
        x_t = x_ref[...]
        chunk = x_t.shape[1] // interleave
        xs = [
            x_t[:, i * chunk : (i + 1) * chunk] for i in range(interleave)
        ]
    ds = _split_rows(d_ref[...], interleave)
    # Channel-plane composite + transposed heads by default (fl_comp=rows
    # reverts to the row-major composite for attribution). Hardware
    # limitation: Mosaic lowers the contiguous [1, RT*S] -> [RT, S] plane
    # reshape only at the native lane width (S=128 verified; S=64/256 hit
    # "infer-vector-layout: unsupported shape cast"), so other sample
    # counts take the row-major path on real TPU. Interpret mode keeps
    # planes at any S for CPU math coverage.
    planes = cfg.probe("fl_comp") != "rows" and (s == 128 or _interpret())

    # ---- forward: activations stay live for the backward ----
    raw_rgbs, raw_dens, hs, vs = _forward_chunks(
        cfg, dt, s, xs, ds, ws, bs, x_t=True, heads_t_out=planes
    )

    # ---- composite + loss grad + composite bwd, whole tile at once ----
    # The composite tensors are [rays_tile, S]-sized (tiny next to the MLP
    # activations); batching all chunks into ONE composite turns the
    # 2*interleave few-row scan matmuls into 2 full-tile ones and issues
    # each VPU elementwise chain once instead of `interleave` times.
    cat_axis = 1 if planes else 0
    raw_rgb = jnp.concatenate(raw_rgbs, axis=cat_axis)
    raw_den = jnp.concatenate(raw_dens, axis=cat_axis)
    rt = delta_ref.shape[0]
    if cfg.probe("fl_variant") == "nocomp":
        # attribution probe: skip the composite/loss-grad/composite-bwd
        # epilogue; data-dependent fillers keep the bwd alive.
        if planes:
            comp = raw_rgb[:, :rt].T * 0.5
            acc_out = raw_den[:, :rt].T * 0.5
            wts = jnp.broadcast_to(raw_den[:, :rt].T * 0.25, (rt, s))
            g_rgb = raw_rgb.astype(jnp.float32) * 1e-3
            g_den = raw_den.astype(jnp.float32) * 1e-3
        else:
            comp = raw_rgb[:rt, :] * 0.5
            acc_out = raw_den[:rt, :] * 0.5
            wts = jnp.broadcast_to(raw_den[:rt, :] * 0.25, (rt, s))
            g_rgb = raw_rgb.astype(jnp.float32) * 1e-3
            g_den = raw_den.astype(jnp.float32) * 1e-3
    else:
        composite = _composite_planes if planes else _composite_chunk
        comp, acc_out, wts, g_rgb, g_den = composite(
            cfg, white_bkgd, s, raw_rgb, raw_den, delta_ref[...],
            pix_ref[...], gsc_ref[...],
        )
    if planes:
        chunk_r = g_rgb.shape[1] // interleave
        g_rgbs = [g_rgb[:, i * chunk_r : (i + 1) * chunk_r]
                  for i in range(interleave)]
        g_dens = [g_den[:, i * chunk_r : (i + 1) * chunk_r]
                  for i in range(interleave)]
    else:
        g_rgbs = _split_rows(g_rgb, interleave)
        g_dens = _split_rows(g_den, interleave)

    # ---- MLP backward reusing the live activations (no recompute) ----
    if cfg.probe("fl_variant") == "nobwd":  # ablation: skip MLP backward
        for r in list(dw_refs) + list(db_refs):
            r[...] = jnp.zeros(r.shape, r.dtype) + g_rgbs[0][0, 0]
    else:
        _backward_chunks(
            cfg, dt, s, xs, ds, ws, bs, g_rgbs, g_dens,
            _make_acc(branchy=cfg.probe("fm_acc") == "when"), dw_refs, db_refs,
            want_dx=False, want_dd=False, acts=(hs, vs), x_t=True,
            heads_gt=planes,
        )

    comp_ref[...] = comp
    acc_ref[...] = acc_out
    wts_ref[...] = wts


def _level_kernel_twopass(cfg: Config, dt, s: int, white_bkgd: bool,
                          interleave: int, *refs):
    """Two-pass whole-level train kernel: grid (n_tiles, 2).

    Phase 0 (program_id(1)==0): MLP forward + composite + loss grad +
    the full g-CHAIN — each layer's masked gradient is parked in VMEM
    scratch (persistent across grid steps) and the per-layer db is
    accumulated (tiny VPU reduction on the f32 g). NO dW matmuls issue in
    this phase, so the dependent chain runs without competing for the MXU.

    Phase 1 (program_id(1)==1): pure dW pass — one whole-tile
    (K = tile-rows) matmul per weight matrix from the scratch-stored
    activations and gradients, accumulated across tiles. All matmuls in
    this phase are mutually independent, so the MXU pipelines them
    back-to-back with no chain stalls.

    This is the "true two-pass structure" attack on the measured
    ~0.53 ms/level dW<->g-chain scheduling interaction (docs/PERF.md
    "kernel-internal decomposition"): the r4 probes showed trace-order
    phasing (fm_bwd=phased) and accumulator bandwidth (fm_bwd=bf16acc)
    are NOT the cause, leaving Mosaic's mixed-family schedule — which
    grid-level phase separation removes by construction.
    """
    D, Dc = cfg.net_depth, cfg.net_depth_condition
    skip = cfg.skip_layer
    n_layers = len(layer_dims(cfg))
    x_ref, d_ref, delta_ref, pix_ref, gsc_ref = refs[:5]
    rest = refs[5:]
    w_refs = rest[:n_layers]
    b_refs = rest[n_layers : 2 * n_layers]
    out = rest[2 * n_layers : 4 * n_layers + 3]
    dw_refs = out[:n_layers]
    db_refs = out[n_layers : 2 * n_layers]
    comp_ref, acc_ref, wts_ref = out[2 * n_layers : 2 * n_layers + 3]
    scr = rest[4 * n_layers + 3 :]
    hs_scr = scr[:D]
    vs_scr = scr[D : D + Dc]
    gt_scr = scr[D + Dc : 2 * D + Dc]
    gv_scr = scr[2 * D + Dc : 2 * D + 2 * Dc]
    grgb_scr, gden_scr, gray_scr = scr[2 * D + 2 * Dc :]

    phase = pl.program_id(1)
    acc = _make_acc(branchy=cfg.probe("fm_acc") == "when")
    tile = x_ref.shape[1]
    chunk = tile // interleave
    rays_chunk = chunk // s

    def db_f32(gs):
        return sum(
            jnp.sum(g, axis=0, keepdims=True, dtype=jnp.float32) for g in gs
        )

    @pl.when(phase == 0)
    def _phase_chain():
        ws = [w[...] for w in w_refs]
        bs = [b[...] for b in b_refs]
        x_t = x_ref[...]
        xs = [
            x_t[:, i * chunk : (i + 1) * chunk] for i in range(interleave)
        ]
        ds = _split_rows(d_ref[...], interleave)

        raw_rgbs, raw_dens, hs, vs = _forward_chunks(
            cfg, dt, s, xs, ds, ws, bs, x_t=True
        )
        # park activations for the dW pass
        for c in range(interleave):
            r0 = c * chunk
            for i in range(D):
                hs_scr[i][r0 : r0 + chunk, :] = hs[c][i].astype(dt)
            for j in range(Dc):
                vs_scr[j][r0 : r0 + chunk, :] = vs[c][j].astype(dt)

        comp, acc_out, wts, g_rgb, g_den = _composite_chunk(
            cfg, white_bkgd, s, jnp.concatenate(raw_rgbs, axis=0),
            jnp.concatenate(raw_dens, axis=0), delta_ref[...],
            pix_ref[...], gsc_ref[...],
        )
        grgb_scr[...] = g_rgb
        gden_scr[...] = g_den
        i_rgb = D + 1 + Dc
        g_rgbs = _split_rows(g_rgb, interleave)
        g_dens = _split_rows(g_den, interleave)
        acc(db_refs[i_rgb], db_f32(g_rgbs))
        acc(db_refs[D], db_f32(g_dens))

        def g_store(site, gs, g_ray=None):
            kind, idx = site
            tgt = gt_scr[idx] if kind == "trunk" else gv_scr[idx]
            for c in range(interleave):
                r0 = c * chunk
                tgt[r0 : r0 + chunk, :] = gs[c].astype(dt)
            if g_ray is not None:
                for c in range(interleave):
                    r0 = c * rays_chunk
                    gray_scr[r0 : r0 + rays_chunk, :] = (
                        g_ray[c].astype(dt)
                    )
            layer = idx if kind == "trunk" else D + 1 + idx
            acc(db_refs[layer], db_f32(gs))

        _backward_chunks(
            cfg, dt, s, xs, ds, ws, bs, g_rgbs, g_dens,
            acc, dw_refs, db_refs,
            want_dx=False, want_dd=False, acts=(hs, vs), x_t=True,
            do_dw=False, g_store=g_store,
        )
        comp_ref[...] = comp
        acc_ref[...] = acc_out
        wts_ref[...] = wts

    @pl.when(phase == 1)
    def _phase_dw():
        i_rgb = D + 1 + Dc
        x_t = x_ref[...]
        h_last = hs_scr[D - 1][...]
        # heads
        acc(dw_refs[i_rgb], _mm_tn(vs_scr[Dc - 1][...], grgb_scr[...], dt))
        acc(dw_refs[D], _mm_tn(h_last, gden_scr[...], dt))
        # view branch
        for j in range(Dc - 1, -1, -1):
            gj = gv_scr[j][...]
            if j == 0:
                acc(
                    dw_refs[D + 1],
                    jnp.concatenate(
                        [_mm_tn(h_last, gj, dt),
                         _mm_tn(d_ref[...], gray_scr[...], dt)],
                        axis=0,
                    ),
                )
            else:
                acc(dw_refs[D + 1 + j],
                    _mm_tn(vs_scr[j - 1][...], gj, dt))
        # trunk
        for i in range(D - 1, -1, -1):
            gi = gt_scr[i][...]
            if i == 0:
                acc(dw_refs[0], _mm(x_t, gi, dt))
            elif i % skip == 0:
                acc(
                    dw_refs[i],
                    jnp.concatenate(
                        [_mm_tn(hs_scr[i - 1][...], gi, dt),
                         _mm(x_t, gi, dt)],
                        axis=0,
                    ),
                )
            else:
                acc(dw_refs[i], _mm_tn(hs_scr[i - 1][...], gi, dt))


def _render_kernel(cfg: Config, dt, s: int, white_bkgd: bool,
                   interleave: int, x_mode: str, *refs):
    """Forward-only whole level: MLP + activations + compositing, one
    launch (the render/eval counterpart of ``_level_kernel``)."""
    n_layers = len(layer_dims(cfg))
    if x_mode in ("mv", "pair"):
        a_ref, b_ref, d_ref, delta_ref = refs[:4]
        rest = refs[4:]
    else:
        x_ref, d_ref, delta_ref = refs[:3]
        rest = refs[3:]
    w_refs = rest[:n_layers]
    b_refs = rest[n_layers : 2 * n_layers]
    comp_ref, acc_ref, wts_ref = rest[2 * n_layers :]

    ws = [w[...] for w in w_refs]
    bs = [b[...] for b in b_refs]
    if x_mode == "mv":
        mT, vT = a_ref[...], b_ref[...]
        chunk = mT.shape[1] // interleave
        xs = [
            _encode_chunk(
                cfg, dt,
                mT[:, i * chunk : (i + 1) * chunk],
                vT[:, i * chunk : (i + 1) * chunk],
            )
            for i in range(interleave)
        ]
    elif x_mode == "pair":
        s48, c48 = a_ref[...], b_ref[...]
        chunk = s48.shape[1] // interleave
        xs = [
            (s48[:, i * chunk : (i + 1) * chunk],
             c48[:, i * chunk : (i + 1) * chunk])
            for i in range(interleave)
        ]
    else:
        x_t = x_ref[...]
        chunk = x_t.shape[1] // interleave
        xs = [
            x_t[:, i * chunk : (i + 1) * chunk] for i in range(interleave)
        ]
    ds = _split_rows(d_ref[...], interleave)

    # planes gate: see _level_kernel (S=128-only on hardware)
    planes = cfg.probe("fl_comp") != "rows" and (s == 128 or _interpret())
    raw_rgbs, raw_dens, _, _ = _forward_chunks(
        cfg, dt, s, xs, ds, ws, bs, x_t=True, heads_t_out=planes
    )
    composite_fwd = _composite_fwd_planes if planes else _composite_fwd_chunk
    comp, acc_out, wts, _ = composite_fwd(
        cfg, white_bkgd, s, jnp.concatenate(raw_rgbs, axis=1 if planes else 0),
        jnp.concatenate(raw_dens, axis=1 if planes else 0), delta_ref[...],
    )
    comp_ref[...] = comp
    acc_ref[...] = acc_out
    wts_ref[...] = wts


def _pad_cols(a, tile):
    pad = (-a.shape[1]) % tile
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros((a.shape[0], pad), a.dtype)], axis=1
        )
    return a


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "tile", "s", "white_bkgd", "interleave",
                     "x_mode"),
)
def _fused_render_impl(params, xs_in, d, delta, *, cfg: Config, tile: int,
                       s: int, white_bkgd: bool, interleave: int,
                       x_mode: str = "t"):
    # xs_in: the [F, N] transposed feature tensor ("t"), (mT, vT) [3, N]
    # mean/variance pairs ("mv", in-kernel IPE), or (s48, c48) [3F, N]
    # encoded halves ("pair").
    n = (xs_in[0] if x_mode != "t" else xs_in).shape[1]
    num_rays = n // s
    dims, w_specs, b_specs = _weight_specs(cfg)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    if x_mode != "t":
        params = _permute_ipe_weights(params, cfg)
        xp = [_pad_cols(a, tile) for a in xs_in]
        x_specs = [
            pl.BlockSpec((a.shape[0], tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM)
            for a in xp
        ]
    else:
        xp = [_pad_cols(xs_in, tile)]
        x_specs = [
            pl.BlockSpec((xs_in.shape[0], tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM)
        ]
    rays_tile = tile // s
    dp = _pad_rows(d, rays_tile)
    deltap = _pad_rows(delta, rays_tile)
    n_pad = xp[0].shape[1]
    r_pad = n_pad // s
    grid = (n_pad // tile,)

    def ray_spec(cols):
        return pl.BlockSpec((rays_tile, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        *x_specs,
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
                          interleave, x_mode),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_rows * n_pad,
            bytes_accessed=n_pad * (cfg.location_features + 8) * 2,
            transcendentals=n_pad * (100 if x_mode == "mv" else 4),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(
        *xp, dp, deltap,
        *[w.astype(dt) for w, _ in params],
        *[b.reshape(1, -1) for _, b in params],
    )
    return (
        comp[:num_rays], acc_out[:num_rays, 0], weights[:num_rays]
    )


def fused_level_render(params: Params, cfg: Config, x_enc,
                       dir_enc: jnp.ndarray, t_vals: jnp.ndarray,
                       dirs: jnp.ndarray, white_bkgd: bool,
                       tile: int | None = None, means_covs=None):
    """One level's full RENDER pass (MLP + activations + compositing) as a
    single kernel — the eval/serving counterpart of ``fused_level_train``.

    Subsumes the reference render sequence (MLP launches + the
    ``volumetric_rendering`` kernel, accelerated_functions.cu:318-344) into
    one launch. Returns (comp_rgb [R,3], acc [R], weights [R,S]); no
    gradients, so it is valid for any config (no stop_level_grad proviso).
    With ``means_covs`` the IPE runs inside the kernel too (fuse_ipe).
    """
    num_rays, s = t_vals.shape[0], t_vals.shape[1] - 1
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    x2d, x_mode, _ = _x_inputs(cfg, dt, x_enc, means_covs)
    d2d = dir_enc.reshape(num_rays, dir_enc.shape[-1]).astype(dt)
    d_norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    delta = ((t_vals[..., 1:] - t_vals[..., :-1]) * d_norm).astype(
        jnp.float32
    )
    tile = tile or int(cfg.probe("fr_tile", "0")) or DEFAULT_TILE_RENDER
    if tile % s:
        tile = ((tile + s - 1) // s) * s

    def pick_interleave(default, t):
        il = default
        while il > 1 and (t % il or (t // il) % s):
            il //= 2
        return il

    interleave = pick_interleave(
        int(cfg.probe("fr_il", "0")) or DEFAULT_INTERLEAVE_RENDER, tile
    )
    return _fused_render_impl(
        params, x2d, d2d, delta, cfg=cfg, tile=tile, s=s,
        white_bkgd=white_bkgd, interleave=interleave, x_mode=x_mode,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "tile", "s", "white_bkgd", "interleave",
                     "x_mode", "twopass"),
)
def _fused_level_impl(params, xs_in, d, delta, pixels, g_scale, *,
                      cfg: Config, tile: int, s: int, white_bkgd: bool,
                      interleave: int, x_mode: str = "t",
                      twopass: bool = False):
    # xs_in: the [F, N] TRANSPOSED feature tensor ("t"), (mT, vT) [3, N]
    # mean/variance pairs ("mv", in-kernel IPE), or (s48, c48) [3F, N]
    # XLA-encoded halves ("pair").
    n = (xs_in[0] if x_mode != "t" else xs_in).shape[1]
    num_rays = n // s
    dims, w_specs, b_specs = _weight_specs(cfg)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    if x_mode != "t":
        params_in = _permute_ipe_weights(params, cfg)
        xp = [_pad_cols(a, tile) for a in xs_in]
        x_specs = [
            pl.BlockSpec((a.shape[0], tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM)
            for a in xp
        ]
    else:
        params_in = params
        xp = [_pad_cols(xs_in, tile)]
        x_specs = [
            pl.BlockSpec((xs_in.shape[0], tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM)
        ]
    rays_tile = tile // s
    dp = _pad_rows(d, rays_tile)
    deltap = _pad_rows(delta, rays_tile)
    pixp = _pad_rows(pixels, rays_tile)
    # Zero g_scale on padded rays: their loss gradient vanishes identically,
    # so padding contributes nothing to dW/db.
    gscp = _pad_rows(g_scale, rays_tile)
    n_pad = xp[0].shape[1]
    r_pad = n_pad // s
    # twopass: (tile, phase) grid — phase 0 = fwd+composite+chain,
    # phase 1 = whole-tile dW matmuls from VMEM scratch. Index maps are
    # written variadic so the same specs serve both grid ranks.
    grid = (n_pad // tile, 2) if twopass else (n_pad // tile,)

    def ray_spec(cols):
        return pl.BlockSpec((rays_tile, cols), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        *x_specs,
        ray_spec(d.shape[1]),
        ray_spec(s),
        ray_spec(3),
        ray_spec(1),
        *w_specs,
        *b_specs,
    ]
    acc_dt = (jnp.bfloat16 if cfg.probe("fm_bwd") == "bf16acc"
              else jnp.float32)
    out_specs = [*w_specs, *b_specs, ray_spec(3), ray_spec(1), ray_spec(s)]
    out_shape = (
        [jax.ShapeDtypeStruct((i, o), acc_dt) for i, o in dims]
        + [jax.ShapeDtypeStruct((1, o), jnp.float32) for _, o in dims]
        + [
            jax.ShapeDtypeStruct((r_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, s), jnp.float32),
        ]
    )
    if twopass:
        D, Dc = cfg.net_depth, cfg.net_depth_condition
        nw, nwc = cfg.net_width, cfg.net_width_condition
        scratch_shapes = (
            [pltpu.VMEM((tile, nw), dt) for _ in range(D)]       # hs
            + [pltpu.VMEM((tile, nwc), dt) for _ in range(Dc)]   # vs
            + [pltpu.VMEM((tile, nw), dt) for _ in range(D)]     # g trunk
            + [pltpu.VMEM((tile, nwc), dt) for _ in range(Dc)]   # g view
            + [
                pltpu.VMEM((tile, cfg.num_rgb_channels), jnp.float32),
                pltpu.VMEM((tile, cfg.num_density_channels), jnp.float32),
                pltpu.VMEM((rays_tile, nwc), dt),                # g_ray
            ]
        )
        kernel = functools.partial(
            _level_kernel_twopass, cfg, dt, s, white_bkgd, interleave
        )
    else:
        scratch_shapes = ()
        kernel = functools.partial(
            _level_kernel, cfg, dt, s, white_bkgd, interleave, x_mode
        )
    flops_rows = 3 * 2 * sum(i * o for i, o in dims)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops_rows * n_pad,
            bytes_accessed=n_pad * (cfg.location_features + 16) * 4,
            transcendentals=n_pad * (300 if x_mode == "mv" else 8),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(
        *xp, dp, deltap, pixp, gscp,
        *[w.astype(dt) for w, _ in params_in],
        *[b.reshape(1, -1) for _, b in params_in],
    )
    n_layers = len(dims)
    dws = outs[:n_layers]
    dbs = [b[0] for b in outs[n_layers : 2 * n_layers]]
    d_params = [(dw, db) for dw, db in zip(dws, dbs)]
    if x_mode != "t":  # sin-rows-first weight permutation was applied
        d_params = _unpermute_ipe_dw(d_params, cfg)
    comp = outs[2 * n_layers][:num_rays]
    acc_out = outs[2 * n_layers + 1][:num_rays, 0]
    weights = outs[2 * n_layers + 2][:num_rays]
    return comp, acc_out, weights, d_params


def _x_inputs(cfg: Config, dt, x_enc, means_covs):
    """The kernel's encoded-position inputs + the x-layout mode.

    Modes:
      "mv"  (``means_covs`` given): the IPE runs INSIDE the kernel; pass
            the sample mean/variance transposed ([3, N], N minor — free
            under XLA's layouts).
      "pair" (``x_enc`` is a (sin, cos) tuple of [3F, N] halves from
            ``ops.ipe.integrated_pos_enc_split``): XLA encodes, but the
            interleaved [N, 96] tensor and its [96, N] relayout never
            exist (~1.08 ms/level of layout work on the v5e render path).
      "t"   (``x_enc`` is [R, S, F] features): transposed to [F, N]
            (XLA's encode fusion is feature-major, so the transpose
            fuses away).
    """
    if means_covs is not None:
        means, covs = means_covs
        n = means.shape[0] * means.shape[1]
        mT = means.reshape(n, 3).T.astype(jnp.float32)
        vT = covs.reshape(n, 3).T.astype(jnp.float32)
        return (mT, vT), "mv", n
    if isinstance(x_enc, tuple):
        s48, c48 = x_enc
        return (s48.astype(dt), c48.astype(dt)), "pair", s48.shape[1]
    if x_enc.ndim == 2:
        # Already the transposed [F, N] tensor (integrated_pos_enc_xt).
        return x_enc.astype(dt), "t", x_enc.shape[1]
    num_rays, s, feat = x_enc.shape
    return x_enc.reshape(num_rays * s, feat).T.astype(dt), "t", (
        num_rays * s
    )


def fused_level_train(params: Params, cfg: Config, x_enc,
                      dir_enc: jnp.ndarray, t_vals: jnp.ndarray,
                      dirs: jnp.ndarray, pixels: jnp.ndarray,
                      g_scale: jnp.ndarray, white_bkgd: bool,
                      tile: int | None = None, means_covs=None):
    """One level's full train pass (fwd + loss grad + bwd) in one kernel.

    Args:
      x_enc: [R, S, F] IPE features, a ([3F, N], [3F, N]) sin/cos-half
        tuple (``ops.ipe.integrated_pos_enc_split``), or None with
        ``means_covs``;
      dir_enc: [R, Fd]; t_vals: [R, S+1];
      dirs: [R, 3] unnormalized directions (their norm scales delta);
      pixels: [R, 3]; g_scale: [R, 1] per-ray dL/dcomp scale
      (= level_weight * 2 * mask / sum(mask));
      means_covs: optional ([R, S, 3] mean, [R, S, 3] diag cov) — the IPE
      then runs inside the kernel (cfg.fuse_ipe path).
    Returns:
      comp_rgb [R, 3], acc [R], weights [R, S], d_params (list of (dW, db)).

    ONLY valid when the level's loss is independent of other levels'
    parameters' use — i.e. training with stop_level_grad (the sampled
    Gaussians are constants w.r.t. params).
    """
    num_rays, s = t_vals.shape[0], t_vals.shape[1] - 1
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    xs_in, x_mode, _ = _x_inputs(cfg, dt, x_enc, means_covs)
    d2d = dir_enc.reshape(num_rays, dir_enc.shape[-1]).astype(dt)
    d_norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    delta = ((t_vals[..., 1:] - t_vals[..., :-1]) * d_norm).astype(
        jnp.float32
    )
    tile = tile or int(cfg.probe("fl_tile", "0")) or DEFAULT_TILE_LEVEL
    if tile % s:
        tile = ((tile + s - 1) // s) * s  # tiles must cover whole rays

    def pick_interleave(default, t):
        il = default
        while il > 1 and (t % il or (t // il) % s):
            il //= 2
        return il

    interleave = pick_interleave(
        int(cfg.probe("fl_il", "0")) or DEFAULT_INTERLEAVE_BWD, tile
    )
    # Two-pass backward (chain phase / dW phase over a (tile, 2) grid,
    # see _level_kernel_twopass). Opt-in via fl_variant=twopass while
    # under measurement; requires the plain transposed-x input mode.
    twopass = cfg.probe("fl_variant") == "twopass" and x_mode == "t"
    return _fused_level_impl(
        params, xs_in, d2d, delta, pixels.astype(jnp.float32),
        g_scale.astype(jnp.float32), cfg=cfg, tile=tile, s=s,
        white_bkgd=white_bkgd, interleave=interleave, x_mode=x_mode,
        twopass=twopass,
    )
