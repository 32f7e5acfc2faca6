"""Integrated positional encoding and cone/cylinder -> Gaussian ops.

Pure-JAX oracle implementations of the reference math in
``ScratchNerf/MipHelpers.cs``:

- ``expected_sin``            <- ExpectedSin        (MipHelpers.cs:358-366)
- ``lift_gaussian``           <- LiftGaussian       (MipHelpers.cs:367-390)
- ``conical_frustum_to_gaussian`` <- ConicalFrustumToGaussian (:391-402)
- ``cylinder_to_gaussian``    <- CylinderToGaussian (MipHelpers.cs:403-409)
- ``cast_rays``               <- CastRay            (MipHelpers.cs:410-428)
- ``integrated_pos_enc``      <- IntegratedPositionalEncoding (:429-471)
- ``pos_enc``                 <- PositionalEncoding (MipHelpers.cs:337-356)

These are fully vectorized over [..., num_samples] and jit/vmap/grad-safe;
the Pallas kernels in ``nerf_or_nothing_tpu.kernels`` are tested against them.

Intentional divergence from the reference: ``cast_rays`` maps N+1 t-values to
N Gaussians (canonical mip-NeRF), not the reference's N-1
(``MipHelpers.cs:413`` off-by-one, catalogued SURVEY.md §2.10).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from nerf_or_nothing_tpu.config import RayShape


def expected_sin(x: jnp.ndarray, x_var: jnp.ndarray):
    """E[sin(y)] and Var[sin(y)] for y ~ N(x, x_var) (MipHelpers.cs:358-366)."""
    y = jnp.exp(-0.5 * x_var) * jnp.sin(x)
    y_var = jnp.maximum(
        0.0, 0.5 * (1.0 - jnp.exp(-2.0 * x_var) * jnp.cos(2.0 * x)) - y**2
    )
    return y, y_var


def lift_gaussian(
    directions: jnp.ndarray,
    t_mean: jnp.ndarray,
    t_var: jnp.ndarray,
    r_var: jnp.ndarray,
    diag: bool = True,
):
    """Lift a 1D ray Gaussian to 3D world space (MipHelpers.cs:367-390).

    Args:
      directions: [..., 3] (unnormalized).
      t_mean/t_var/r_var: [..., S].
    Returns:
      mean [..., S, 3] and cov diagonal [..., S, 3] (or full [..., S, 3, 3]).
    """
    mean = directions[..., None, :] * t_mean[..., None]
    d_sq = jnp.maximum(1e-10, jnp.sum(directions**2, axis=-1, keepdims=True))

    if diag:
        d_outer_diag = directions**2  # [..., 3]
        null_outer_diag = 1.0 - d_outer_diag / d_sq
        t_cov_diag = t_var[..., None] * d_outer_diag[..., None, :]
        xy_cov_diag = r_var[..., None] * null_outer_diag[..., None, :]
        return mean, t_cov_diag + xy_cov_diag

    d_outer = directions[..., :, None] * directions[..., None, :]
    eye = jnp.eye(3, dtype=directions.dtype)
    null_outer = eye - d_outer / d_sq[..., None]
    t_cov = t_var[..., None, None] * d_outer[..., None, :, :]
    xy_cov = r_var[..., None, None] * null_outer[..., None, :, :]
    return mean, t_cov + xy_cov


def conical_frustum_to_gaussian(
    directions: jnp.ndarray,
    t0: jnp.ndarray,
    t1: jnp.ndarray,
    base_radius: jnp.ndarray,
    diag: bool = True,
):
    """Stable mean/cov of a conical frustum section (MipHelpers.cs:391-402).

    Mip-NeRF eq. 7 (the numerically stable closed form).
    """
    mu = (t0 + t1) / 2.0
    hw = (t1 - t0) / 2.0
    mu2 = mu * mu
    hw2 = hw * hw
    denom = 3.0 * mu2 + hw2
    t_mean = mu + (2.0 * mu * hw2) / denom
    t_var = hw2 / 3.0 - (4.0 / 15.0) * (hw2 * hw2 * (12.0 * mu2 - hw2)) / (
        denom * denom
    )
    r_var = base_radius**2 * (
        mu2 / 4.0 + (5.0 / 12.0) * hw2 - (4.0 / 15.0) * (hw2 * hw2) / denom
    )
    return lift_gaussian(directions, t_mean, t_var, r_var, diag)


def cylinder_to_gaussian(
    directions: jnp.ndarray,
    t0: jnp.ndarray,
    t1: jnp.ndarray,
    radius: jnp.ndarray,
    diag: bool = True,
):
    """Mean/cov of a cylindrical ray section (MipHelpers.cs:403-409)."""
    t_mean = (t0 + t1) / 2.0
    r_var = radius**2 / 4.0
    t_var = (t1 - t0) ** 2 / 12.0
    return lift_gaussian(directions, t_mean, t_var, r_var, diag)


def cast_rays(
    t_vals: jnp.ndarray,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    radii: jnp.ndarray,
    ray_shape: RayShape = RayShape.CONE,
    diag: bool = True,
):
    """t-interval boundaries -> world-space sample Gaussians.

    Reference: CastRay (MipHelpers.cs:410-428), with the off-by-one fixed:
    [..., S+1] t_vals yield [..., S] Gaussians.

    Args:
      t_vals: [..., S+1]; origins/directions: [..., 3]; radii: [..., 1].
    """
    t0 = t_vals[..., :-1]
    t1 = t_vals[..., 1:]
    if ray_shape == RayShape.CONE:
        mean, cov = conical_frustum_to_gaussian(directions, t0, t1, radii, diag)
    elif ray_shape == RayShape.CYLINDER:
        mean, cov = cylinder_to_gaussian(directions, t0, t1, radii, diag)
    else:
        raise ValueError(f"invalid ray shape {ray_shape}")
    mean = mean + origins[..., None, :]
    return mean, cov


def integrated_pos_enc(
    means_covs,
    min_deg: int,
    max_deg: int,
    diag: bool = True,
    dtype=None,
    fast: bool = False,
) -> jnp.ndarray:
    """IPE of Gaussian samples (MipHelpers.cs:429-471).

    Feature layout matches the reference exactly: for each frequency i,
    [sin(2^i x) block (3), cos block (3)] interleaved — i.e.
    features = concat_i [E_sin(2^i mu, 4^i var), E_sin(2^i mu + pi/2, ...)].
    Returns [..., S, 2*(max_deg-min_deg)*3]. Identity is NOT included
    (unlike pos_enc), matching the reference and canonical mip-NeRF.

    Structure is deliberately 2D-flat: leading dims are collapsed and the
    features emitted as ONE last-axis concatenation of [N, 3] blocks, so XLA
    compiles the whole encode into a single fusion writing the row-major
    [N, 96] tensor the Pallas kernels consume — the previous 4D
    [R, S, F, 6] intermediate forced two full-tensor layout copies
    (~0.17 ms/step measured, docs/PERF.md r3). ``dtype`` casts the output
    inside the same fusion (bf16 for the kernel path: halves the HBM write).

    ``fast``: use the reduced-precision transcendentals (ops/fastmath.py,
    ~1e-7 absolute in the live-frequency regime — far below the bf16
    output quantum) instead of the library sin/cos/exp. The encode is
    transcendental-throughput-bound (~0.34 ms/step at flagship shapes,
    docs/PERF.md round 4), so this is a pure-perf knob (cfg.fast_ipe).
    """
    mean, cov = means_covs
    if not diag:
        # Per-axis variance from the full covariance: row-norms of (cov*scale)
        # reduce to diag(cov) scaling — extract the diagonal.
        cov = jnp.diagonal(cov, axis1=-2, axis2=-1)
    out_dt = dtype or mean.dtype
    scales = jnp.asarray(
        [2.0**i for i in range(min_deg, max_deg)], dtype=mean.dtype
    )
    # y: [..., S, F, 3]; y_var likewise.
    y = mean[..., None, :] * scales[:, None]
    y_var = cov[..., None, :] * (scales[:, None] ** 2)
    # E[sin] = exp(-var/2) sin(y); E[cos] = exp(-var/2) cos(y): the damping
    # factor is SHARED — computing it once saves a third of the
    # transcendentals vs two expected_sin calls (this op runs on the full
    # [rays*samples, F, 3] tensor every level, so it is HBM/VPU-visible).
    if fast:
        from nerf_or_nothing_tpu.ops.fastmath import (
            fast_cos, fast_exp_neg, fast_sin,
        )

        # Separate sin/cos chains, concat at the END — the measured-best
        # structure on v5e (197.9k rays/s train). FOUR alternatives each
        # measured worse (docs/PERF.md round 5): shared-reduction
        # fast_sincos 191.4k (diamond dependency schedules worse);
        # split transposed halves (pair_ipe) 185.7k; direct-transposed
        # [96, N] single-fusion (xt_ipe) 177.1k; pre-transcendental
        # concat + single sin6 187.0k. XLA materializes every layout
        # variation as relayouts that cost more than they save.
        damp = fast_exp_neg(0.5 * y_var)
        sin_y, cos_y = fast_sin(y), fast_cos(y)
    else:
        damp = jnp.exp(-0.5 * y_var)
        sin_y, cos_y = jnp.sin(y), jnp.cos(y)
    # Interleave per-frequency [sin(3), cos(3)] like the reference layout;
    # the dtype cast happens inside this same fusion (bf16 on the kernel
    # path halves the HBM write of the [R*S, 96] feature tensor).
    feats = jnp.concatenate(
        [damp * sin_y, damp * cos_y], axis=-1
    ).astype(out_dt)                                   # [..., F, 6]
    return feats.reshape(*feats.shape[:-2], -1)


def integrated_pos_enc_split(
    means_covs,
    min_deg: int,
    max_deg: int,
    diag: bool = True,
    dtype=None,
    fast: bool = False,
):
    """IPE emitted as TRANSPOSED sin/cos halves: ([3F, N], [3F, N]).

    Same math as ``integrated_pos_enc`` but laid out for the fused-level
    kernel's split-x mode: row 3*j+k of each half is frequency j, axis k,
    of all N samples — the feature-minor [N, 96] tensor, its
    per-frequency [sin3|cos3] interleave, and the [96, N] relayout the
    kernel needs NEVER exist. On the v5e render path that chain (concat
    fusion + bitcast-transpose) measured 1.08 ms/level of pure layout
    work (docs/PERF.md round 5). The kernel consumes the halves with
    sin-rows-first permuted weights (``fused_level._ipe_perm``).
    """
    mean, cov = means_covs
    if not diag:
        cov = jnp.diagonal(cov, axis1=-2, axis2=-1)
    out_dt = dtype or mean.dtype
    F = max_deg - min_deg
    n = int(np.prod(mean.shape[:-1]))
    mT = mean.reshape(n, 3).T                      # [3, N]
    vT = cov.reshape(n, 3).T
    scales = jnp.asarray(
        [2.0**i for i in range(min_deg, max_deg)], dtype=mean.dtype
    )[:, None, None]                               # [F, 1, 1]
    y = (mT[None] * scales).reshape(3 * F, n)      # [3F, N]
    y_var = (vT[None] * (scales * scales)).reshape(3 * F, n)
    if fast:
        from nerf_or_nothing_tpu.ops.fastmath import (
            fast_cos, fast_exp_neg, fast_sin,
        )

        damp = fast_exp_neg(0.5 * y_var)
        sin_y, cos_y = fast_sin(y), fast_cos(y)
    else:
        damp = jnp.exp(-0.5 * y_var)
        sin_y, cos_y = jnp.sin(y), jnp.cos(y)
    return (damp * sin_y).astype(out_dt), (damp * cos_y).astype(out_dt)


def integrated_pos_enc_xt(
    means_covs,
    min_deg: int,
    max_deg: int,
    diag: bool = True,
    dtype=None,
    fast: bool = False,
):
    """IPE emitted DIRECTLY as the transposed [6F, N] feature tensor.

    Row 6i+p*3+k (frequency i, phase p in {sin, cos}, axis k) of all N
    samples — the exact transposed interleaved layout the fused-level
    kernel consumes ("t" mode). Built as ONE elementwise expression with
    per-row scale/phase-shift columns and a single ``sin``
    (cos = sin(y + pi/2)): no [N, 96] intermediate, no sin/cos concat
    fusion, no [96, N] relayout — the three together measured
    1.08 ms/level of layout work on the v5e render path, and the earlier
    "pair" (split-halves) attempt was WORSE (XLA materialized its
    [F, 3, N] broadcasts + reshapes as relayouts; docs/PERF.md round 5).

    The mean/cov transposes are bitcasts: XLA lays [N, 3] tensors out
    plane-major (three full-lane [N] planes), which IS [3, N].
    """
    mean, cov = means_covs
    if not diag:
        cov = jnp.diagonal(cov, axis1=-2, axis2=-1)
    out_dt = dtype or mean.dtype
    F = max_deg - min_deg
    n = int(np.prod(mean.shape[:-1]))
    mT = mean.reshape(n, 3).T                     # [3, N] (bitcast)
    vT = cov.reshape(n, 3).T
    m96 = jnp.concatenate([mT] * (2 * F), axis=0)  # row j -> axis j % 3
    v96 = jnp.concatenate([vT] * (2 * F), axis=0)
    j = np.arange(6 * F)
    scales = jnp.asarray(
        np.exp2(min_deg + j // 6), dtype=mean.dtype
    )[:, None]                                    # [6F, 1]
    shift = jnp.asarray(
        ((j % 6) >= 3) * (np.pi / 2.0), dtype=mean.dtype
    )[:, None]
    y = m96 * scales + shift
    y_var = v96 * (scales * scales)
    if fast:
        from nerf_or_nothing_tpu.ops.fastmath import (
            fast_exp_neg, fast_sin,
        )

        feats = fast_exp_neg(0.5 * y_var) * fast_sin(y)
    else:
        feats = jnp.exp(-0.5 * y_var) * jnp.sin(y)
    return feats.astype(out_dt)                   # [6F, N]


def pos_enc(x: jnp.ndarray, min_deg: int, max_deg: int) -> jnp.ndarray:
    """Classic positional encoding with identity (MipHelpers.cs:337-356).

    Layout: [x, sin(2^min x), cos(2^min x), ..., sin, cos] with each block of
    3 components contiguous — [..., 3 + 2*(max_deg-min_deg)*3].
    """
    scales = jnp.asarray([2.0**i for i in range(min_deg, max_deg)], x.dtype)
    xb = x[..., None, :] * scales[:, None]  # [..., F, 3]
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    feats = jnp.concatenate([sin, cos], axis=-1).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, feats], axis=-1)
