"""Fused MipNeRF MLP forward + backward as single Pallas TPU kernels.

This is the TPU-native replacement for the reference's CUDA MLP pipeline
(``AcceleratedNeRFUtils/accelerated_functions.cu:36-182`` — one thread per
output scalar, 12 kernel launches with a ``cudaDeviceSynchronize`` after each,
``AcceleratedMLP.cpp:214-314``) re-designed for the MXU instead of translated:

- ONE kernel evaluates all trunk layers, the density head, and the view
  branch for a tile of (ray, sample) rows; every intermediate activation
  lives in VMEM — no HBM round-trip between layers (the dominant cost of the
  unfused XLA path: ~11 x [N,256] tensors through HBM per level).
- All ~494k parameters (~1 MB bf16) stay resident in VMEM across the whole
  grid.
- Matmuls run on the MXU in bf16 with f32 accumulation
  (``preferred_element_type``); parameter master copies stay f32.
- The skip concat (MLP.cs:95: input re-concatenated at layer
  ``skip_layer``) and the view concat (MLP.cs:102-105) are computed as split
  matmuls — ``concat(h, x) @ W == h @ W_top + x @ W_bot`` — so the
  concatenated tensor is never materialized (same trick as the reference's
  ``get_neuron_output_conjoined_inputs`` kernel, accelerated_functions.cu:75,
  but tiled on the MXU).
- The backward kernel recomputes activations tile-wise in VMEM (flash-style;
  residuals for a whole level would be ~700 MB in HBM) and accumulates
  per-layer dW/db across the row-tile grid in f32 VMEM blocks — TPU grids
  execute sequentially, so accumulation order is deterministic, unlike the
  reference's ``atomicAdd`` backward (accelerated_functions.cu:105-181)
  whose gradients are nondeterministic.
- Input gradients (d_x_enc, d_dir_enc) are exact when requested: the
  transposed matmuls are already needed to chain dW to earlier layers. When
  the caller proves they are unused (``input_grads=False`` — training with
  ``stop_level_grad``, where sampling depends only on ray constants), their
  matmuls and HBM writes are statically elided (~6% off the backward).

The Adam update is NOT folded in here (the reference fuses it to save kernel
launches, accelerated_functions.cu:403). MEASURED, not asserted (XProf
per-op trace of the flagship step, docs/PERF.md r3): the entire non-kernel
XLA remainder — Adam, grad clip/stats, sampling, resampling, dispatch — is
~0.6 ms/step, of which the Adam/clip fusions are ~0.02 ms (the grad-norm
concatenate is 0.011 ms, every Adam fusion is below the 0.001 ms floor).
Folding Adam into the final grid step could recover at most ~0.3% of the
step while forcing the m/v state through VMEM and serializing the last
grid step against 6 extra MB of operands; the reference's fusion win was
launch overhead its own per-tensor kernel design created.

Numerics gate: ``tests/test_kernels_mlp.py`` asserts allclose vs
``models.mlp.apply_mlp`` (the oracle) for forward and for jax.grad.
"""

from __future__ import annotations

import functools
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_or_nothing_tpu.config import Config
from nerf_or_nothing_tpu.models.mlp import Params, layer_dims

# Rows of (ray, sample) pairs processed per grid step.
# Rows per grid step. The forward keeps only transient activations in VMEM
# so it can run bigger tiles (larger MXU ops); the backward holds every
# layer's bf16 activations + the f32 dW accumulators resident, capping it
# lower (at 8x256 defaults: ~6 MB acts + 2 MB dW + 1 MB weights at 1024).
# Values picked by an on-chip v5e sweep (tiles 1024-16384, interleave 1-4).
DEFAULT_TILE_FWD = 4096
DEFAULT_TILE_BWD = 2048
DEFAULT_INTERLEAVE = 8
# 2 on the backward: with the branchless accumulator, interleave 2 edged
# out 4 on-chip (2.685 vs 2.705 ms/level, consistent across reruns).
DEFAULT_INTERLEAVE_BWD = 2


def _mm(a, b, dt, out_dt=jnp.float32):
    """a @ b on the MXU in compute dtype with f32 accumulation.

    (out_dt must stay f32 on current Mosaic: `tpu.matmul` rejects non-32-bit
    accumulators, so bf16 results need an explicit post-cast.)"""
    return jax.lax.dot_general(
        a.astype(dt), b.astype(dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=out_dt,
    )


def _mm_tn(a, b, dt, out_dt=jnp.float32):
    """a.T @ b without materializing the transpose (contract over rows)."""
    return jax.lax.dot_general(
        a.astype(dt), b.astype(dt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=out_dt,
    )


def _mm_nt(a, b, dt, out_dt=jnp.float32):
    """a @ b.T without materializing the transpose (contract over cols)."""
    return jax.lax.dot_general(
        a.astype(dt), b.astype(dt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=out_dt,
    )


def _forward_chunks(cfg: Config, dt, s: int, xs, ds, ws, bs, x_t=False,
                    heads_t_out=False):
    """Shared fwd math on a LIST of independent row chunks.

    Each layer is computed for every chunk before moving to the next layer —
    consecutive MXU ops are then independent, so the systolic-array fill of
    chunk c+1's layer-i matmul overlaps the drain of chunk c's (a single
    row tile is a chain of 13 *dependent* matmuls whose pipeline bubbles
    cost ~15% at these shapes).

    acts = per-chunk lists of post-ReLU trunk activations h_0..h_{D-1} plus
    view-branch activations, stored in the compute dtype (bf16) — they feed
    matmuls (which take bf16 operands anyway) and ReLU masks, so keeping
    them f32 would only double VMEM. Heads stay f32 (f32 accumulator+bias).

    ``ds`` chunks are PER-RAY: [chunk/s, Fd] with ``s`` samples per ray. The
    view-layer contribution ``d @ W_bot`` is computed once per ray and
    broadcast to the ray's rows in VMEM — the reference encodes the
    direction once per ray too (MipNerfModel.cs:70), but the unfused path
    materializes the [rays*samples, Fd] broadcast through HBM.

    ``x_t``: the encoded-position chunks come TRANSPOSED ([F, rows] instead
    of [rows, F]). XLA's layout assignment computes the IPE feature-major
    (N minor); accepting that layout directly removes two full-tensor
    layout copies per level (~0.18 ms/step measured) — the MXU contracts
    either operand orientation at the same cost (dot_general dims).

    A chunk may also be a PAIR of transposed halves (sin-features,
    cos-features) computed in-kernel by the fused IPE
    (fused_level._encode_chunk); the corresponding weight rows must then be
    permuted sin-rows-first (fused_level._ipe_perm) and x @ W becomes a
    two-part split matmul — the interleaved feature tensor never exists.
    """
    D, Dc = cfg.net_depth, cfg.net_depth_condition
    skip = cfg.skip_layer
    nw = cfg.net_width
    C = len(xs)

    def cast_x(x):
        if isinstance(x, tuple):
            return tuple(p.astype(dt) for p in x)
        return x.astype(dt)

    xs = [cast_x(x) for x in xs]
    ds = [d.astype(dt) for d in ds]

    def mm_x(xc, w, _dt):
        if isinstance(xc, tuple):
            f2 = xc[0].shape[0]
            return (_mm_tn(xc[0], w[:f2, :], _dt)
                    + _mm_tn(xc[1], w[f2:, :], _dt))
        return (_mm_tn if x_t else _mm)(xc, w, _dt)

    def epilogue(z, b):
        return jnp.maximum(z + b, 0.0).astype(dt)

    # fm_heads=t (perf probe): evaluate the narrow heads as TRANSPOSED
    # matmuls — W^T [out, in] @ h^T [in, rows] with out = 1 or 3 on the
    # sublane axis — instead of [rows, in] @ [in, out] with out padded to
    # 128 lanes (~8% of fwd padded FLOPs, docs/PERF.md "head padding").
    heads_t = cfg.probe("fm_heads") == "t"

    def head(h, w, b):
        if heads_t_out:
            # TRANSPOSED head output [out, rows]: out (1 or 3) pads to 8
            # SUBLANES instead of 128 lanes — 16x less padded MXU work —
            # and each output row reshapes CONTIGUOUSLY to a full-lane
            # [rays, S] channel plane for the composite (fused_level).
            zt = jax.lax.dot_general(
                w.astype(dt), h,
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [out, rows]
            return zt + b.T
        if heads_t:
            zt = jax.lax.dot_general(
                w.astype(dt), h,
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [out, rows]
            return zt.T + b
        return _mm(h, w, dt) + b

    hs: List[List[Any]] = [[] for _ in range(C)]
    hcur = [None] * C
    for i in range(D):
        w, b = ws[i], bs[i]
        for c in range(C):
            if i % skip == 0 and i > 0:
                # concat(h, x) @ w == h @ w_top + x @ w_bot
                z = (_mm(hcur[c], w[:nw, :], dt)
                     + mm_x(xs[c], w[nw:, :], dt))
            elif i == 0:
                z = mm_x(xs[c], w, dt)
            else:
                z = _mm(hcur[c], w, dt)
            hcur[c] = epilogue(z, b)
            hs[c].append(hcur[c])

    raw_density = [head(hcur[c], ws[D], bs[D]) for c in range(C)]

    hv = list(hcur)
    vs: List[List[Any]] = [[] for _ in range(C)]
    for j in range(Dc):
        w, b = ws[D + 1 + j], bs[D + 1 + j]
        for c in range(C):
            if j == 0:
                dc = _mm(ds[c], w[nw:, :], dt)  # [chunk/s, nwc], per ray
                xc = xs[c][0] if isinstance(xs[c], tuple) else xs[c]
                chunk = xc.shape[1] if x_t else xc.shape[0]
                if s > 1:
                    dc = jnp.broadcast_to(
                        dc[:, None, :], (chunk // s, s, dc.shape[-1])
                    ).reshape(chunk, dc.shape[-1])
                z = _mm(hv[c], w[:nw, :], dt) + dc
            else:
                z = _mm(hv[c], w, dt)
            hv[c] = epilogue(z, b)
            vs[c].append(hv[c])

    raw_rgb = [head(hv[c], ws[D + 1 + Dc], bs[D + 1 + Dc])
               for c in range(C)]
    return raw_rgb, raw_density, hs, vs


def _split_rows(a, n: int):
    if n == 1:
        return [a]
    chunk = a.shape[0] // n
    return [a[i * chunk : (i + 1) * chunk] for i in range(n)]


def _fwd_kernel(cfg: Config, dt, s: int, interleave: int, *refs):
    n_layers = len(layer_dims(cfg))
    x_ref, d_ref = refs[0], refs[1]
    w_refs = refs[2 : 2 + n_layers]
    b_refs = refs[2 + n_layers : 2 + 2 * n_layers]
    rgb_ref, den_ref = refs[2 + 2 * n_layers], refs[3 + 2 * n_layers]

    ws = [w[...] for w in w_refs]
    bs = [b[...] for b in b_refs]
    raw_rgb, raw_density, _, _ = _forward_chunks(
        cfg, dt, s,
        _split_rows(x_ref[...], interleave),
        _split_rows(d_ref[...], interleave),
        ws, bs,
    )
    rgb_ref[...] = jnp.concatenate(raw_rgb, axis=0)
    den_ref[...] = jnp.concatenate(raw_density, axis=0)


def _make_acc(branchy: bool = False):
    """Grid-step accumulator: dW/db out blocks have a constant index map, so
    they stay in VMEM across the sequential grid; step 0 initializes, later
    steps add (deterministic — SURVEY.md §5.2).

    Default is BRANCHLESS: an unconditional read + select + write. Each
    ``pl.when``-predicated region is a control-flow boundary the Mosaic
    scheduler does not move MXU ops across; the backward issues ~26
    accumulations per grid step, and the branchy form MEASURED
    +0.26 ms/level on v5e (2.96 -> 2.70, docs/PERF.md round 4) — most of
    the dW/g-chain "scheduling interaction" that had survived every
    ordering probe (all of which kept the branchy accumulate). The branchy
    variant remains as the ``fm_acc=when`` attribution probe."""
    is_first = pl.program_id(0) == 0

    def acc(ref, val):
        # cast to the accumulator dtype (f32; bf16 under the fm_bwd=bf16acc
        # attribution probe) before the read-modify-write
        val = val.astype(ref.dtype)
        if not branchy:
            # step 0 reads uninitialized VMEM; the select discards it
            # elementwise (NaN-safe: select, not arithmetic).
            prev = jnp.where(is_first, jnp.zeros_like(val), ref[...])
            ref[...] = prev + val
            return

        @pl.when(is_first)
        def _():
            ref[...] = val

        @pl.when(jnp.logical_not(is_first))
        def _():
            ref[...] = ref[...] + val

    return acc


def _backward_chunks(cfg, dt, s, xs, ds, ws, bs, g_rgbs, g_dens, acc,
                     dw_refs, db_refs, want_dx=True, want_dd=True,
                     acts=None, x_t=False, do_dw=True, g_store=None,
                     heads_gt=False):
    """Recompute-forward + full reverse pass over a LIST of independent row
    chunks; returns (list of g_x or None, list of per-ray g_d or None).

    ``acts``: optional precomputed per-chunk (hs, vs) activation lists from
    ``_forward_chunks`` — skips the recompute pass entirely (used by the
    fused-level kernel, where the forward ran in the same kernel invocation
    and the activations are still resident in VMEM).

    Like ``_forward_chunks``, each layer's matmuls run for every chunk
    before moving on, so consecutive MXU ops are independent. The chunk
    dW/db contributions are summed on the VPU (tiny [K,256] adds) before
    one ``acc`` into the grid accumulator.

    ``want_dx``/``want_dd`` statically elide the encoded-input cotangent
    math (layer-0 and skip-layer dX matmuls, the per-ray dD matmul, and
    their HBM writes) — used when the caller proves those cotangents are
    unused (training with ``stop_level_grad``: sampling depends only on ray
    constants, so dL/d(x_enc) never reaches a parameter; the reference's
    backward likewise drops encoded-input grads,
    accelerated_functions.cu:154-182)."""
    D, Dc = cfg.net_depth, cfg.net_depth_condition
    skip = cfg.skip_layer
    nw = cfg.net_width
    C = len(xs)
    R = range(C)
    assert not (x_t and want_dx), "transposed-x mode elides dX"

    xs = [
        tuple(p.astype(dt) for p in x) if isinstance(x, tuple)
        else x.astype(dt)
        for x in xs
    ]
    if acts is None:
        _, _, hs, vs = _forward_chunks(cfg, dt, s, xs, ds, ws, bs, x_t=x_t)
    else:
        hs, vs = acts

    # Perf-attribution hook (docs/PERF.md kernel-internal decomposition),
    # read from cfg.kernel_probes (benchmarks/profile_step.py --probes):
    # fm_bwd=nodw replaces the dW/db matmul family with shape-matched
    # fillers; fm_bwd=nogchain breaks the g-chain instead; fm_bwd=phased
    # issues the ENTIRE g-chain first and all dW/db matmuls afterwards;
    # fm_bwd=phasedbar additionally puts a lax.optimization_barrier between
    # the phases (every dW operand artificially depends on the WHOLE
    # chain, so no scheduler may interleave the families); fm_bwd=bf16acc
    # accumulates dW in bf16 (halved accumulator read-modify-write traffic
    # — attribution only, numerics are off). Inert unless set.
    _probe = cfg.probe("fm_bwd")

    # In the phased modes the dW/db accumulations are recorded as
    # (fn, operands) pairs during the chain walk — operands captured
    # explicitly at emit time, never as free closure variables — and
    # traced only after the whole g-chain has been emitted, so the trace
    # shows two disjoint phases: a pure dependent chain, then a burst of
    # independent accumulations.
    _deferred: List[Any] = []

    def emit(fn, *ops):
        # do_dw=False: the caller runs the dW/db family in a LATER grid
        # phase from scratch-stored gradients (two-pass backward,
        # fused_level._level_kernel_twopass); this walk only drives the
        # chain and hands each layer's masked g to ``g_store``.
        if not do_dw:
            return
        if _probe in ("phased", "phasedbar"):
            _deferred.append((fn, ops))
        else:
            fn(*ops)

    def store(site, gs, g_ray=None):
        if g_store is not None:
            g_store(site, gs, g_ray)

    def db(gs):
        # bias grads reduce over up to thousands of rows: accumulate f32
        return sum(
            jnp.sum(g, axis=0, keepdims=True, dtype=jnp.float32) for g in gs
        )

    def _dummy(shape, gs):
        # data-dependent filler (defeats constant folding), no MXU work;
        # single-axis (sublane) broadcast — Mosaic has no 2-axis broadcast
        row = gs[0][:1, :].astype(jnp.float32)  # [1, out]
        return jnp.broadcast_to(row, shape)

    def dw(h_ins, gs):
        if _probe == "nodw":
            return _dummy((h_ins[0].shape[1], gs[0].shape[1]), gs)
        if _probe == "accper":
            # per-chunk products, accumulated one-by-one by acc_dw
            return [_mm_tn(h_ins[c], gs[c], dt) for c in R]
        return sum(_mm_tn(h_ins[c], gs[c], dt) for c in R)

    def _s(v):
        return sum(v) if isinstance(v, list) else v

    # fm_heads=t (perf probe, see _forward_chunks): narrow-head backward
    # without 128-lane padding — dW as a transposed M=out matmul, the
    # chain contribution as out<=3 VPU outer products (broadcast multiply-
    # adds that run under the MXU's shadow instead of K-padded matmuls).
    heads_t = cfg.probe("fm_heads") == "t"

    def dw_head(h_ins, gs):
        if not heads_t or _probe in ("nodw", "accper"):
            return dw(h_ins, gs)
        return sum(_mm_tn(gs[c], h_ins[c], dt) for c in R).T

    def head_chain_terms(gs, w):
        # [rows, out] x [in, out] -> [rows, in] as out outer products
        out = []
        for c in R:
            rows, nw_in = gs[c].shape[0], w.shape[0]
            acc_v = None
            for k in range(w.shape[1]):
                a = jnp.broadcast_to(
                    gs[c][:, k : k + 1].astype(jnp.float32), (rows, nw_in)
                )
                b = jnp.broadcast_to(
                    w[:, k : k + 1].T.astype(jnp.float32), (rows, nw_in)
                )
                t = a * b
                acc_v = t if acc_v is None else acc_v + t
            out.append(acc_v.astype(dt))
        return out

    def acc_dw(ref, val):
        # fm_bwd=accper: feed each chunk's dW product to the accumulator as
        # it retires instead of joining all chunks on the VPU first.
        if isinstance(val, list):
            acc(ref, val[0])
            for v in val[1:]:
                ref[...] = ref[...] + v
        else:
            acc(ref, val)

    def dw_x(gs):
        if _probe == "nodw":
            x0 = xs[0]
            k = (2 * x0[0].shape[0] if isinstance(x0, tuple)
                 else (x0.shape[0] if x_t else x0.shape[1]))
            return _dummy((k, gs[0].shape[1]), gs)
        # x^T @ g with x stored transposed: a plain [F, rows] @ [rows, out]
        if isinstance(xs[0], tuple):
            # in-kernel IPE pair: dW rows come out sin-first (permuted
            # order); the wrapper inverse-permutes outside the kernel.
            return jnp.concatenate(
                [sum(_mm(xs[c][0], gs[c], dt) for c in R),
                 sum(_mm(xs[c][1], gs[c], dt) for c in R)],
                axis=0,
            )
        if x_t:
            return sum(_mm(xs[c], gs[c], dt) for c in R)
        return sum(_mm_tn(xs[c], gs[c], dt) for c in R)

    def chain(real, fallback):
        # fm_bwd=nogchain: replace every g-chain matmul with the (shape-
        # matched, data-dependent) forward activation, breaking the layer-
        # to-layer dependency while keeping dW/db/mask work intact.
        if _probe == "nogchain":
            return [fallback[c] for c in R]
        return real()

    # ---- head cotangents in TRANSPOSED [out, chunk] form (heads_gt) ----
    # The chain contribution contracts over out (K = 1 or 3, padded to 8
    # sublanes instead of 128 lanes) and dW comes out as [out, in] (one
    # tiny transpose before the accumulate) — the 128-lane head padding
    # disappears from the backward too.
    # NB (probe scope): dw_gt bypasses dw()/acc_dw(), so the fm_bwd=accper
    # and fm_heads=t attribution probes are INERT for the two heads on the
    # default channel-plane path (heads_gt=True) — they only change head
    # behavior under fl_comp=rows. Trunk/view-branch dW still honors them.
    def chain_gt(g_t, w):
        # [out, chunk] x [in, out] -> [chunk, in]
        return jax.lax.dot_general(
            g_t.astype(dt), w.astype(dt),
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dw_gt(h_ins, g_ts, shape):
        if _probe == "nodw":
            return jnp.broadcast_to(
                g_ts[0][:, :1].T.astype(jnp.float32), shape
            )
        return sum(
            jax.lax.dot_general(
                g_ts[c].astype(dt), h_ins[c].astype(dt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for c in R
        ).T  # [out, in] -> [in, out]

    def db_gt(g_ts):
        return sum(
            jnp.sum(g, axis=1, keepdims=True, dtype=jnp.float32)
            for g in g_ts
        ).T

    # ---- rgb head ----
    i_rgb = D + 1 + Dc
    # the g chain runs in the compute dtype (its operands are cast to dt
    # before every MXU op anyway); dW/db accumulate in f32. The g-chain
    # matmul is ISSUED FIRST each layer: it is the critical path (the next
    # layer's mask needs it), while the dW/db products only feed the grid
    # accumulator - issue order biases Mosaic's scheduler toward keeping
    # the chain moving with the accumulation behind it.
    _h_rgb = [vs[c][-1] for c in R]
    if heads_gt:
        g_next = chain(
            lambda: [chain_gt(g_rgbs[c], ws[i_rgb]).astype(dt) for c in R],
            _h_rgb,
        )
        emit(
            lambda h, g: acc(
                dw_refs[i_rgb], dw_gt(h, g, dw_refs[i_rgb].shape)
            ),
            _h_rgb, g_rgbs,
        )
        emit(lambda g: acc(db_refs[i_rgb], db_gt(g)), g_rgbs)
    else:
        g_next = chain(
            lambda: (
                head_chain_terms(g_rgbs, ws[i_rgb]) if heads_t
                else [_mm_nt(g_rgbs[c], ws[i_rgb], dt).astype(dt)
                      for c in R]
            ),
            _h_rgb,
        )
        emit(lambda h, g: acc_dw(dw_refs[i_rgb], dw_head(h, g)),
             _h_rgb, g_rgbs)
        emit(lambda g: acc(db_refs[i_rgb], db(g)), g_rgbs)
    g = g_next

    # ---- view branch reversed ----
    g_d = [None] * C
    for j in range(Dc - 1, -1, -1):
        i = D + 1 + j
        # compare in f32: Mosaic has no bf16 cmpf on v5e
        g = [g[c] * (vs[c][j].astype(jnp.float32) > 0.0) for c in R]
        h_in = [vs[c][j - 1] if j > 0 else hs[c][-1] for c in R]
        if j == 0:
            # per-ray reduction first: sum_{rows of ray r} g gives both the
            # d-block weight grad and the per-ray d grad with [rows/s]-sized
            # matmuls instead of [rows]-sized broadcast ones.
            if s > 1:
                g_ray = [
                    jnp.sum(
                        g[c].reshape(g[c].shape[0] // s, s, g[c].shape[-1]),
                        axis=1, dtype=jnp.float32,
                    )
                    for c in R
                ]
            else:
                g_ray = g
            store(("view", j), g, g_ray)
            emit(
                lambda g, g_ray, h_in, i=i: acc(
                    dw_refs[i],
                    jnp.concatenate(
                        [_s(dw(h_in, g)),
                         _dummy((ds[0].shape[1], g_ray[0].shape[1]), g_ray)
                         if _probe == "nodw" else
                         sum(_mm_tn(ds[c], g_ray[c], dt) for c in R)],
                        axis=0,
                    ),
                ),
                g, g_ray, h_in,
            )
            emit(lambda g, i=i: acc(db_refs[i], db(g)), g)
            if want_dd:
                g_d = [_mm_nt(g_ray[c], ws[i][nw:, :], dt) for c in R]
            g = chain(
                lambda: [_mm_nt(g[c], ws[i][:nw, :], dt).astype(dt)
                         for c in R],
                [hs[c][-1] for c in R],
            )
        else:
            store(("view", j), g)
            g_next = chain(
                lambda: [_mm_nt(g[c], ws[i], dt).astype(dt) for c in R],
                [vs[c][j - 1] for c in R],
            )
            emit(lambda g, h_in, i=i: acc_dw(dw_refs[i], dw(h_in, g)),
                 g, h_in)
            emit(lambda g, i=i: acc(db_refs[i], db(g)), g)
            g = g_next

    # ---- density head joins the trunk gradient (MLP.cs:148-153) ----
    _h_den = [hs[c][-1] for c in R]
    if heads_gt:
        emit(
            lambda h, g: acc(dw_refs[D], dw_gt(h, g, dw_refs[D].shape)),
            _h_den, g_dens,
        )
        emit(lambda g: acc(db_refs[D], db_gt(g)), g_dens)
        g = chain(
            lambda: [g[c] + chain_gt(g_dens[c], ws[D]).astype(dt)
                     for c in R],
            _h_den,
        )
    else:
        emit(lambda h, g: acc_dw(dw_refs[D], dw_head(h, g)), _h_den, g_dens)
        emit(lambda g: acc(db_refs[D], db(g)), g_dens)
        if heads_t:
            _den_terms = head_chain_terms(g_dens, ws[D])
            g = chain(
                lambda: [g[c] + _den_terms[c] for c in R],
                [hs[c][-1] for c in R],
            )
        else:
            g = chain(
                lambda: [g[c] + _mm_nt(g_dens[c], ws[D], dt).astype(dt)
                         for c in R],
                [hs[c][-1] for c in R],
            )

    # ---- trunk reversed ----
    g_x = [jnp.zeros_like(xs[c]) for c in R] if want_dx else [None] * C
    for i in range(D - 1, -1, -1):
        g = [g[c] * (hs[c][i].astype(jnp.float32) > 0.0) for c in R]
        store(("trunk", i), g)
        h_in = [hs[c][i - 1] if i > 0 else None for c in R]
        if i % skip == 0 and i > 0:
            g_next = chain(
                lambda: [_mm_nt(g[c], ws[i][:nw, :], dt).astype(dt)
                         for c in R],
                [hs[c][i - 1] for c in R],
            )
            emit(
                lambda g, h_in, i=i: acc(
                    dw_refs[i],
                    jnp.concatenate([_s(dw(h_in, g)), _s(dw_x(g))], axis=0),
                ),
                g, h_in,
            )
            emit(lambda g, i=i: acc(db_refs[i], db(g)), g)
            if want_dx:
                g_x = [
                    g_x[c] + _mm_nt(g[c], ws[i][nw:, :], dt).astype(dt)
                    for c in R
                ]
            g = g_next
        else:
            if i > 0 or want_dx:
                g_next = chain(
                    lambda: [_mm_nt(g[c], ws[i], dt).astype(dt) for c in R],
                    [hs[c][max(i - 1, 0)] for c in R],
                )
            emit(
                lambda g, h_in, i=i: acc_dw(
                    dw_refs[i], dw(h_in, g) if i > 0 else dw_x(g)
                ),
                g, h_in,
            )
            emit(lambda g, i=i: acc(db_refs[i], db(g)), g)
            if i > 0 or want_dx:
                g = g_next
    if _deferred:  # phased modes: dW/db burst after the whole chain
        opss = [ops for _, ops in _deferred]
        if _probe == "phasedbar":
            # Artificial dependency of EVERY dW/db operand on the entire
            # chain: no scheduler may interleave the two matmul families.
            flat, tree = jax.tree_util.tree_flatten(opss)
            opss = jax.tree_util.tree_unflatten(
                tree, jax.lax.optimization_barrier(flat)
            )
        for (fn, _), ops in zip(_deferred, opss):
            fn(*ops)
    if want_dx:
        g_x = [g_x[c] + g[c] for c in R]  # layer 0's input IS x
    return g_x, g_d


def _bwd_kernel(cfg: Config, dt, s: int, input_grads: bool, interleave: int,
                *refs):
    n_layers = len(layer_dims(cfg))
    x_ref, d_ref, grgb_ref, gden_ref = refs[:4]
    w_refs = refs[4 : 4 + n_layers]
    b_refs = refs[4 + n_layers : 4 + 2 * n_layers]
    out = refs[4 + 2 * n_layers :]
    dw_refs = out[:n_layers]
    db_refs = out[n_layers : 2 * n_layers]

    g_x, g_d = _backward_chunks(
        cfg, dt, s,
        _split_rows(x_ref[...], interleave),
        _split_rows(d_ref[...], interleave),
        [w[...] for w in w_refs], [b[...] for b in b_refs],
        _split_rows(grgb_ref[...], interleave),
        _split_rows(gden_ref[...], interleave),
        _make_acc(branchy=cfg.probe("fm_acc") == "when"), dw_refs, db_refs,
        want_dx=input_grads, want_dd=input_grads,
    )
    if input_grads:
        dx_ref, dd_ref = out[2 * n_layers], out[2 * n_layers + 1]
        dx_ref[...] = jnp.concatenate(g_x, axis=0).astype(dx_ref.dtype)
        dd_ref[...] = jnp.concatenate(g_d, axis=0).astype(dd_ref.dtype)


def _pad_rows(a: jnp.ndarray, tile: int) -> jnp.ndarray:
    n = a.shape[0]
    pad = (-n) % tile
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros((pad, *a.shape[1:]), a.dtype)], axis=0
        )
    return a


def _weight_specs(cfg: Config):
    dims = layer_dims(cfg)
    w_specs = [
        pl.BlockSpec((i, o), lambda *_: (0, 0), memory_space=pltpu.VMEM)
        for i, o in dims
    ]
    b_specs = [
        pl.BlockSpec((1, o), lambda *_: (0, 0), memory_space=pltpu.VMEM)
        for _, o in dims
    ]
    return dims, w_specs, b_specs


def _interpret() -> bool:
    """Interpret mode off-TPU so the same tests run on the CPU mesh.

    'axon' is a tunneled TPU PJRT platform — compiled Mosaic works there.
    """
    return jax.default_backend() not in ("tpu", "axon")


@functools.partial(
    jax.jit, static_argnames=("cfg", "tile", "s", "interleave")
)
def _fused_mlp_fwd_impl(params, x, d, *, cfg: Config, tile: int, s: int = 1,
                        interleave: int = 1):
    n = x.shape[0]
    dims, w_specs, b_specs = _weight_specs(cfg)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    xp = _pad_rows(x, tile)
    dp = _pad_rows(d, tile // s)  # d is per-ray: n/s rows
    n_pad = xp.shape[0]
    grid = (n_pad // tile,)

    in_specs = [
        pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile // s, d.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        *w_specs,
        *b_specs,
    ]
    out_specs = [
        pl.BlockSpec((tile, cfg.num_rgb_channels), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, cfg.num_density_channels), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    flops_rows = 2 * sum(i * o for i, o in dims)
    raw_rgb, raw_den = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg, dt, s, interleave),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, cfg.num_rgb_channels), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, cfg.num_density_channels),
                                 jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_rows * n_pad,
            bytes_accessed=n_pad * (x.shape[1] + d.shape[1] + 4) * 4,
            transcendentals=0,
        ),
        # Large row tiles (bigger MXU ops) need more than the conservative
        # 16 MB default scoped-VMEM cap; v5e has 128 MB per core.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(
        xp, dp,
        # pre-cast weights once per call; the kernel body would otherwise
        # re-cast all ~494k params on every grid step
        *[w.astype(dt) for w, _ in params],
        *[b.reshape(1, -1) for _, b in params],
    )
    return raw_rgb[:n], raw_den[:n]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "tile", "s", "input_grads", "interleave"),
)
def _fused_mlp_bwd_impl(params, x, d, g_rgb, g_den, *, cfg: Config,
                        tile: int, s: int = 1, input_grads: bool = True,
                        interleave: int = 1):
    n = x.shape[0]
    dims, w_specs, b_specs = _weight_specs(cfg)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    xp = _pad_rows(x, tile)
    dp = _pad_rows(d, tile // s)  # per-ray
    gp = _pad_rows(g_rgb, tile)
    gdp = _pad_rows(g_den, tile)
    n_pad = xp.shape[0]
    grid = (n_pad // tile,)

    in_specs = [
        pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile // s, d.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, g_rgb.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, g_den.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        *w_specs,
        *b_specs,
    ]
    # dW/db accumulate in place across the sequential grid.
    acc_dt = (jnp.bfloat16 if cfg.probe("fm_bwd") == "bf16acc"
              else jnp.float32)
    out_specs = [*w_specs, *b_specs]
    out_shape = (
        [jax.ShapeDtypeStruct((i, o), acc_dt) for i, o in dims]
        + [jax.ShapeDtypeStruct((1, o), jnp.float32) for _, o in dims]
    )
    if input_grads:
        out_specs += [
            pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile // s, d.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((n_pad, x.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((n_pad // s, d.shape[1]), jnp.float32),
        ]
    flops_rows = 3 * 2 * sum(i * o for i, o in dims)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg, dt, s, input_grads, interleave),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_rows * n_pad,
            bytes_accessed=n_pad * 2 * (x.shape[1] + d.shape[1] + 4) * 4,
            transcendentals=0,
        ),
        # bf16 activations + f32 dW accumulators at tile 1024 need ~17 MB;
        # raise the scoped-VMEM cap above the conservative 16 MB default.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(
        xp, dp, gp, gdp,
        *[w.astype(dt) for w, _ in params],
        *[b.reshape(1, -1) for _, b in params],
    )
    n_layers = len(dims)
    dws = outs[:n_layers]
    dbs = [b[0] for b in outs[n_layers : 2 * n_layers]]
    d_params = [(dw, db) for dw, db in zip(dws, dbs)]
    if input_grads:
        dx = outs[2 * n_layers][:n]
        dd = outs[2 * n_layers + 1][: n // s]
    else:
        # Cotangents proven unused upstream: symbolic zeros (XLA folds the
        # dependent IPE/PE backward chains away entirely).
        dx = jnp.zeros((n, x.shape[1]), x.dtype)
        dd = jnp.zeros((n // s, d.shape[1]), d.dtype)
    return d_params, dx, dd


# ----------------------------------------------------------------------------
# custom_vjp wrapper matching models.mlp.apply_mlp's signature
# ----------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _fused_apply(params, x2d, d2d, cfg: Config, tile_fwd: int,
                 tile_bwd: int, s: int, input_grads: bool, interleave: int,
                 interleave_bwd: int):
    return _fused_mlp_fwd_impl(params, x2d, d2d, cfg=cfg, tile=tile_fwd,
                               s=s, interleave=interleave)


def _fused_apply_fwd(params, x2d, d2d, cfg, tile_fwd, tile_bwd, s,
                     input_grads, interleave, interleave_bwd):
    out = _fused_mlp_fwd_impl(params, x2d, d2d, cfg=cfg, tile=tile_fwd,
                              s=s, interleave=interleave)
    return out, (params, x2d, d2d)


def _fused_apply_bwd(cfg, tile_fwd, tile_bwd, s, input_grads, interleave,
                     interleave_bwd, res, grads):
    params, x2d, d2d = res
    g_rgb, g_den = grads
    d_params, dx, dd = _fused_mlp_bwd_impl(
        params, x2d, d2d, g_rgb, g_den, cfg=cfg, tile=tile_bwd, s=s,
        input_grads=input_grads, interleave=interleave_bwd,
    )
    return d_params, dx.astype(x2d.dtype), dd.astype(d2d.dtype)


_fused_apply.defvjp(_fused_apply_fwd, _fused_apply_bwd)


def fused_mlp_apply(params: Params, cfg: Config, x: jnp.ndarray,
                    dir_enc: jnp.ndarray, tile: int | None = None,
                    tile_bwd: int | None = None, input_grads: bool = True):
    """Drop-in replacement for ``models.mlp.apply_mlp`` (same signature).

    Args:
      x: [..., S, location_features]; dir_enc: [..., direction_features].
      input_grads: when False, the backward statically skips the dX/dD
        cotangent math and returns zeros for them — ONLY valid when the
        caller proves those cotangents cannot reach a differentiated leaf
        (training with ``stop_level_grad``, where sampling depends only on
        ray constants).
    Returns:
      raw_rgb [..., S, 3], raw_density [..., S, 1], f32.
    """
    lead = x.shape[:-1]
    feat = x.shape[-1]
    n = int(np.prod(lead))
    num_samples = x.shape[-2]
    num_rays = n // num_samples
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    # Cast inputs to the compute dtype up front: the kernels cast tiles to
    # ``dt`` anyway, so this is numerically identical, but it halves the
    # HBM traffic for the inputs and for the residuals the VJP saves.
    x2d = x.reshape(n, feat).astype(dt)
    tile_fwd = tile or DEFAULT_TILE_FWD
    tile_bwd = tile_bwd or tile or DEFAULT_TILE_BWD
    # Interleaved chunks must also cover whole rays (per-ray d broadcast).
    def pick_interleave(default, t):
        il = default
        while il > 1 and (t % il or (t // il) % num_samples):
            il //= 2
        return il

    interleave = pick_interleave(DEFAULT_INTERLEAVE, tile_fwd)
    interleave_bwd = pick_interleave(DEFAULT_INTERLEAVE_BWD, tile_bwd)
    if tile_fwd % num_samples == 0 and tile_bwd % num_samples == 0:
        # Per-ray d: rows are ray-major, so a tile covers whole rays and
        # the kernel broadcasts the per-ray view contribution in VMEM.
        s = num_samples
        d2d = dir_enc.reshape(num_rays, dir_enc.shape[-1]).astype(dt)
    else:
        # Fallback for shapes where tiles straddle rays: pre-broadcast.
        s = 1
        d2d = jnp.broadcast_to(
            dir_enc[..., None, :], (*lead, dir_enc.shape[-1])
        ).reshape(n, dir_enc.shape[-1]).astype(dt)
    raw_rgb, raw_den = _fused_apply(
        params, x2d, d2d, cfg, tile_fwd, tile_bwd, s, input_grads,
        interleave, interleave_bwd,
    )
    return (
        raw_rgb.reshape(*lead, cfg.num_rgb_channels),
        raw_den.reshape(*lead, cfg.num_density_channels),
    )


def make_mlp_apply(cfg: Config):
    """Select the MLP forward per config (Pallas fused vs plain XLA)."""
    if cfg.use_pallas:
        return fused_mlp_apply
    from nerf_or_nothing_tpu.models.mlp import apply_mlp

    def plain(params, c, x, d):
        dt = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        return apply_mlp(params, c, x, d, compute_dtype=dt)

    return plain
